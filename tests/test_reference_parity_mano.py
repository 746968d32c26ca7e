"""MANO LBS numerical A/B vs the reference's REAL manopth layer.

Runs `/root/reference/manopth/manolayer.py::ManoLayer.forward` (rodrigues,
shape/pose blendshapes, the level-wise rigid chain, linear blend skinning,
mm scaling) with OUR synthetic MANO buffers loaded in place of the licensed
pkl, against `geometry/mano.py::mano_forward` on identical inputs:
  - vertices must match (the LBS core — convention-independent),
  - the 16 kinematic joints must match after inverting manopth's
    visualization reorder (manolayer.py:260).
Fingertip VERTEX ids intentionally differ (we use the smplx vertex_ids
contract, manopth samples its own tips) so tips are excluded here; the
reorder map itself is covered by `reorder_joints_manopth`'s unit test.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from uvhand_tpu.geometry import mano as mano_lib

torch = pytest.importorskip("torch")

B = 4


def _build_ref_layer(model):
    """Reference ManoLayer with our synthetic buffers, bypassing the
    licensed-pkl __init__ (only `ready_arguments` needs the asset)."""
    import importlib

    import reference_stubs as rs

    rs.install_stubs()
    # the licensed MANO loader import (manolayer.py:7)
    for name in ("mano", "mano.webuser",
                 "mano.webuser.smpl_handpca_wrapper_HAND_only"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["mano.webuser.smpl_handpca_wrapper_HAND_only"].ready_arguments = None

    ml = importlib.import_module("manopth.manolayer")
    layer = ml.ManoLayer.__new__(ml.ManoLayer)
    torch.nn.Module.__init__(layer)
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    layer.th_v_template = t(model.v_template)[None]
    layer.th_shapedirs = t(model.shapedirs)
    # ours: (135, 778*3) row-major (v, c); manopth: (778, 3, 135)
    layer.th_posedirs = t(
        np.asarray(model.posedirs).reshape(135, 778, 3).transpose(1, 2, 0))
    layer.th_J_regressor = t(model.J_regressor)
    layer.th_weights = t(model.lbs_weights)
    layer.th_hands_mean = t(model.hands_mean)
    layer.th_betas = t(np.zeros((1, 10)))
    layer.use_pca = False
    layer.rot = 3
    layer.ncomps = 45
    layer.joint_rot_mode = "axisang"
    layer.root_rot_mode = "axisang"
    layer.robust_rot = False
    layer.side = "right"
    layer.center_idx = None
    return layer


def test_mano_lbs_parity_vs_manopth():
    model = mano_lib.synthetic_mano(0, True)
    layer = _build_ref_layer(model)

    rng = np.random.default_rng(1)
    go = rng.normal(scale=0.4, size=(B, 3)).astype(np.float32)
    hp = rng.normal(scale=0.3, size=(B, 45)).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)

    with torch.no_grad():
        th_pose = torch.from_numpy(np.concatenate([go, hp], 1))
        ref_v, ref_j = layer(th_pose, th_betas=torch.from_numpy(betas))
    ref_v = ref_v.numpy() / 1000.0  # manopth returns millimeters
    ref_j = ref_j.numpy() / 1000.0

    # ours: hands_mean added when flat_hand_mean=False, like the layer
    our_v, our_j21 = mano_lib.mano_forward(
        model, jnp.asarray(go), jnp.asarray(hp), jnp.asarray(betas),
        flat_hand_mean=False)
    our_v = np.asarray(our_v)
    our_j21 = np.asarray(our_j21)

    np.testing.assert_allclose(our_v, ref_v, atol=2e-6, rtol=1e-5)

    # the 16 kinematic joints: invert manopth's 21-joint reorder
    perm = list(mano_lib.JOINT_REORDER_MANOPTH)
    pre = np.empty_like(ref_j)
    for out_pos, src in enumerate(perm):
        pre[:, src] = ref_j[:, out_pos]
    np.testing.assert_allclose(our_j21[:, :16], pre[:, :16],
                               atol=2e-6, rtol=1e-5)


def test_mano_lbs_parity_rotmat_input():
    """pose_is_rotmat path vs the layer's joint_rot_mode='rotmat' branch
    (batch_rotprojs projects inputs to SO(3), so feed exact rotations)."""
    from uvhand_tpu.geometry.rotations import axis_angle_to_matrix

    model = mano_lib.synthetic_mano(0, True)
    layer = _build_ref_layer(model)
    layer.use_pca = False
    layer.joint_rot_mode = "rotmat"

    rng = np.random.default_rng(2)
    aa = rng.normal(scale=0.3, size=(B, 16, 3)).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)
    rots = np.asarray(axis_angle_to_matrix(jnp.asarray(aa.reshape(-1, 3)))
                      ).reshape(B, 16, 3, 3)

    import reference_stubs as rs

    # rotproj.batch_rotprojs hard-codes .cuda() (rotproj.py:18)
    with rs.torch_cuda_as_cpu(), torch.no_grad():
        ref_v, _ = layer(torch.from_numpy(rots),
                         th_betas=torch.from_numpy(betas))
    ref_v = ref_v.numpy() / 1000.0

    our_v, _ = mano_lib.mano_forward(
        model, jnp.asarray(rots[:, 0]), jnp.asarray(rots[:, 1:]),
        jnp.asarray(betas), pose_is_rotmat=True)
    np.testing.assert_allclose(np.asarray(our_v), ref_v, atol=5e-6, rtol=1e-4)
