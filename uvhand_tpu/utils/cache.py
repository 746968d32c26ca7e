"""Persistent XLA compilation cache.

The axon TPU path remote-compiles; full-model programs take minutes. The
on-disk cache makes recompiles (bench reruns, driver checks, CLI restarts)
near-instant. Call `enable_compilation_cache()` before the first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "UVHAND_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
