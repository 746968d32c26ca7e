"""AIK numerical A/B vs the reference's REAL adaptive_IK.

Runs `/root/reference/AIK/AIK_torch.py::adaptive_IK` (per-sample torch:
global Arun fit + per-bone swing decomposition along the kinematic tree;
its twist angles `angels0` are hard-coded zero, matching our twist-free
formulation) against `geometry/aik.py::adaptive_ik` on identical targets,
comparing the recovered 48-d axis-angle poses and their FK round-trips.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from uvhand_tpu.geometry import aik

torch = pytest.importorskip("torch")

B = 3


def test_adaptive_ik_parity():
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import importlib

    ref_aik = importlib.import_module("AIK.AIK_torch")

    template = np.asarray(aik.TEMPLATE_RIGHT, np.float32)
    rng = np.random.default_rng(0)
    # plausible targets: FK of random (bounded) poses from the SAME template
    pose = (rng.normal(scale=0.25, size=(B, 48)).astype(np.float32))
    P = np.asarray(aik.aik_fk(jnp.asarray(pose), jnp.asarray(template)))

    ours = np.asarray(aik.adaptive_ik(jnp.asarray(P), jnp.asarray(template)))

    with torch.no_grad():
        ref = ref_aik.adaptive_IK(
            torch.from_numpy(template), torch.from_numpy(P)
        ).numpy().reshape(B, 48)

    # axis-angle equality (both sides use acos/SVD float32 paths)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)

    # and the FK round-trips agree with the targets for BOTH solvers
    for name, sol in (("ours", ours), ("ref", ref)):
        back = np.asarray(aik.aik_fk(jnp.asarray(sol), jnp.asarray(template)))
        np.testing.assert_allclose(back, P, atol=2e-3, err_msg=name)
