"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use
XLA_FLAGS=--xla_force_host_platform_device_count=8 per SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already have been imported by a pytest plugin (chex/flax), in which
# case it latched JAX_PLATFORMS at import time; override via config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(3)
