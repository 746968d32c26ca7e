"""Checkpoint save/restore via Orbax.

Parity with the reference surface (`/root/reference/util/settings.py:447-515`
`load_resume`, `main.py:165-189` per-epoch saves):
  - per-epoch checkpoints `{output_dir}/{epoch}` with model params, optimizer
    state, epoch and config,
  - selective restore via `not_use_params` keyword filtering (params whose
    path matches any keyword keep their fresh init),
  - tolerant optimizer/scheduler restore (mismatch -> fresh opt state),
  - `resume_dir` multi-checkpoint sweeps (list_checkpoints).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Sequence

import jax
import orbax.checkpoint as ocp


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def save_checkpoint(output_dir: str, epoch: int, state, extra: Optional[dict] = None):
    ckpt_dir = os.path.abspath(os.path.join(output_dir, str(epoch)))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    ckptr.save(ckpt_dir, payload, force=True)
    ckptr.wait_until_finished()
    if extra is not None:
        import json

        with open(os.path.join(output_dir, f"{epoch}.meta.json"), "w") as f:
            json.dump(extra, f, default=str)
    return ckpt_dir


def load_checkpoint(
    ckpt_dir: str,
    state,
    not_use_params: Optional[Sequence[str]] = None,
    load_opt: bool = True,
):
    """Restore into `state`; params matching not_use_params keywords keep
    their current (fresh) values. Optimizer state restored tolerantly."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    try:
        restored = ckptr.restore(os.path.abspath(ckpt_dir), template)
    except Exception:
        # tolerant path: restore params only
        restored = {
            "params": ckptr.restore(
                os.path.abspath(ckpt_dir), {"params": state.params}
            )["params"],
            "opt_state": state.opt_state,
            "step": state.step,
        }
        load_opt = False

    params = restored["params"]
    if not_use_params:
        fresh = state.params

        def select(path, new, old):
            p = _path_str(path)
            return old if any(kw in p for kw in not_use_params) else new

        params = jax.tree_util.tree_map_with_path(select, params, fresh)

    state = state.replace(params=params)
    if load_opt:
        state = state.replace(opt_state=restored["opt_state"], step=restored["step"])
    return state


def load_torch_pth(path: str, state, not_use_params: Optional[Sequence[str]] = None,
                   **convert_kwargs):
    """Resume from a reference `.pth` checkpoint: convert the torch state
    dict onto the flax tree (train/convert.py); optimizer state stays fresh.
    Applies the same `not_use_params` keyword filter as `load_checkpoint`
    (`util/settings.py:447-515`)."""
    import jax.numpy as jnp

    from .convert import load_torch_checkpoint

    converted = load_torch_checkpoint(path, **convert_kwargs)["params"]
    params = jax.tree.map(jnp.asarray, converted)
    if not_use_params:
        def select(p, new, old):
            s = _path_str(p)
            return old if any(kw in s for kw in not_use_params) else new

        params = jax.tree_util.tree_map_with_path(select, params, state.params)
    return state.replace(params=params)


def list_checkpoints(resume_dir: str):
    """All epoch checkpoints in a dir, sorted (reference --resume_dir sweep)."""
    out = []
    for name in os.listdir(resume_dir):
        if re.fullmatch(r"\d+", name) and os.path.isdir(os.path.join(resume_dir, name)):
            out.append((int(name), os.path.join(resume_dir, name)))
    return [p for _, p in sorted(out)]
