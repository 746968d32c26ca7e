"""MANO hand model: linear blend skinning in pure JAX.

Capability parity with the reference's body-model runtime
(`/root/reference/arctic_tools/common/body_models.py:128` `build_mano_aa` →
`smplx.MANO(use_pca=False, flat_hand_mean=False)`) and the standalone manopth
LBS (`/root/reference/manopth/manolayer.py:110-274`), re-implemented from the
MANO/SMPL papers' math as a functional JAX pipeline.

Output contract (matches the smplx path the reference trains with):
  - vertices: (..., 778, 3) meters
  - joints:   (..., 21, 3) meters = 16 kinematic joints followed by 5
    fingertip vertices [thumb 744, index 320, middle 443, ring 554, pinky 672]
    (smplx `vertex_ids['mano']`); joint 0 is the wrist/root.

Model parameters live in a `MANOModel` pytree so the whole forward is
jit/vmap/grad-safe and shardable. Load real MANO pkls with `load_mano_pkl`
(applies the left-hand shapedirs sign fix like smplx does); tests use
`synthetic_mano` because MANO assets are licensed and not distributable.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .rotations import axis_angle_to_matrix

# smplx vertex_ids['mano']: fingertip vertices appended after the 16 joints
TIP_VERTEX_IDS = (744, 320, 443, 554, 672)  # thumb, index, middle, ring, pinky

# MANO kinematic parents for the 16 joints (wrist + 3 per finger, order:
# index(1-3), middle(4-6), pinky(7-9), ring(10-12), thumb(13-15))
MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# manopth visualization/eval reorder: kinematic+tips -> wrist, thumb..pinky
# chains (`/root/reference/manopth/manolayer.py:260`)
JOINT_REORDER_MANOPTH = (
    0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20,
)

NUM_VERTS = 778
NUM_JOINTS = 16
NUM_SHAPE = 10
NUM_POSE_FEAT = (NUM_JOINTS - 1) * 9  # 135


@struct.dataclass
class MANOModel:
    """MANO parameters as a pytree of fp32 arrays (all static shapes)."""

    v_template: jnp.ndarray  # (778, 3)
    shapedirs: jnp.ndarray  # (778, 3, 10)
    posedirs: jnp.ndarray  # (135, 778*3)
    J_regressor: jnp.ndarray  # (16, 778)
    lbs_weights: jnp.ndarray  # (778, 16)
    hands_mean: jnp.ndarray  # (45,)
    faces: jnp.ndarray = struct.field(pytree_node=False, default=None)  # (F, 3) int
    is_rhand: bool = struct.field(pytree_node=False, default=True)


def _np(x: Any) -> np.ndarray:
    """Materialize chumpy/scipy-sparse/np objects from a MANO pkl."""
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    if hasattr(x, "r"):
        return np.asarray(x.r)
    return np.asarray(x)


def load_mano_pkl(path: str, is_rhand: bool | None = None) -> MANOModel:
    """Load MANO_RIGHT.pkl / MANO_LEFT.pkl (original MPI assets)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if is_rhand is None:
        is_rhand = "RIGHT" in path.upper()
    shapedirs = _np(data["shapedirs"]).astype(np.float32)[..., :NUM_SHAPE]
    if not is_rhand and np.sum(np.abs(shapedirs[:, 0, :])) > 0:
        # original MANO_LEFT.pkl shapedirs x-axis bug; smplx applies this fix
        shapedirs = shapedirs.copy()
        shapedirs[:, 0, :] *= -1
    posedirs = _np(data["posedirs"]).astype(np.float32)
    posedirs = posedirs.reshape(NUM_VERTS * 3, NUM_POSE_FEAT).T  # (135, 2334)
    return MANOModel(
        v_template=jnp.asarray(_np(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(_np(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(_np(data["weights"]), jnp.float32),
        hands_mean=jnp.asarray(_np(data["hands_mean"]), jnp.float32),
        faces=np.asarray(_np(data["f"]), np.int32),
        is_rhand=bool(is_rhand),
    )


def synthetic_mano(seed: int = 0, is_rhand: bool = True) -> MANOModel:
    """Random but structurally-valid MANO for tests (assets are licensed)."""
    rng = np.random.default_rng(seed)
    # place joints on a plausible chain so the rigid math is exercised
    joints = rng.normal(scale=0.03, size=(NUM_JOINTS, 3)).astype(np.float32)
    for j in range(1, NUM_JOINTS):
        joints[j] += joints[MANO_PARENTS[j]]
    # vertices scattered near joints; J_regressor = soft assignment such that
    # J_regressor @ v_template reproduces `joints`
    assign = rng.integers(0, NUM_JOINTS, size=NUM_VERTS)
    v_template = joints[assign] + rng.normal(scale=0.01, size=(NUM_VERTS, 3))
    J_reg = np.zeros((NUM_JOINTS, NUM_VERTS), np.float32)
    for j in range(NUM_JOINTS):
        members = np.where(assign == j)[0]
        J_reg[j, members] = 1.0 / len(members)
    joints_reg = J_reg @ v_template
    v_template = v_template + (joints - joints_reg)[assign]  # exact regression
    w = np.zeros((NUM_VERTS, NUM_JOINTS), np.float32)
    w[np.arange(NUM_VERTS), assign] = 0.8
    w[np.arange(NUM_VERTS), np.maximum(np.array(MANO_PARENTS)[assign], 0)] += 0.2
    w /= w.sum(1, keepdims=True)
    return MANOModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(rng.normal(scale=0.001, size=(NUM_VERTS, 3, NUM_SHAPE)), jnp.float32),
        posedirs=jnp.asarray(rng.normal(scale=0.0001, size=(NUM_POSE_FEAT, NUM_VERTS * 3)), jnp.float32),
        J_regressor=jnp.asarray(J_reg),
        lbs_weights=jnp.asarray(w),
        hands_mean=jnp.asarray(rng.normal(scale=0.05, size=(45,)), jnp.float32),
        faces=np.zeros((1538, 3), np.int32),
        is_rhand=is_rhand,
    )


def _rigid_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray):
    """Forward-kinematic chain (SMPL batch_rigid_transform semantics).

    rot_mats: (B, 16, 3, 3), joints: (B, 16, 3) rest joints.
    Returns posed joints (B, 16, 3) and skinning transforms A (B, 16, 4, 4).
    """
    parents = np.asarray(MANO_PARENTS)
    rel = joints - jnp.where(
        (parents >= 0)[None, :, None], joints[:, np.maximum(parents, 0)], 0.0
    )

    def make_T(R, t):
        B = R.shape[0]
        T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
        T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
        return T

    T_local = make_T(rot_mats, rel)  # (B, 16, 4, 4)
    # sequential chain over 16 joints — unrolled, tiny matmuls fuse fine
    world = [T_local[:, 0]]
    for j in range(1, NUM_JOINTS):
        world.append(world[parents[j]] @ T_local[:, j])
    T_world = jnp.stack(world, axis=1)  # (B, 16, 4, 4)

    posed_joints = T_world[..., :3, 3]
    # remove rest-pose joint location: A = T_world * [I, -j; 0, 1]
    tj = jnp.einsum("bkij,bkj->bki", T_world[..., :3, :3], joints)
    A = T_world.at[..., :3, 3].add(-tj)
    return posed_joints, A


def mano_forward(
    model: MANOModel,
    global_orient: jnp.ndarray,
    hand_pose: jnp.ndarray,
    betas: jnp.ndarray,
    transl: jnp.ndarray | None = None,
    flat_hand_mean: bool = False,
    pose_is_rotmat: bool = False,
):
    """MANO LBS forward.

    global_orient: (B, 3) axis-angle or (B, 3, 3) if pose_is_rotmat.
    hand_pose: (B, 45) axis-angle or (B, 15, 3, 3). The hands_mean offset is
      added for axis-angle input when flat_hand_mean=False (the reference's
      training configuration, body_models.py:128).
    betas: (B, 10). transl: optional (B, 3).
    Returns (vertices (B,778,3), joints (B,21,3)) in meters.
    """
    B = betas.shape[0]
    if pose_is_rotmat:
        rot_mats = jnp.concatenate(
            [global_orient.reshape(B, 1, 3, 3), hand_pose.reshape(B, 15, 3, 3)], axis=1
        )
    else:
        if not flat_hand_mean:
            hand_pose = hand_pose + model.hands_mean
        full_pose = jnp.concatenate([global_orient, hand_pose], axis=-1)
        rot_mats = axis_angle_to_matrix(full_pose.reshape(B, NUM_JOINTS, 3))

    # shape blendshapes
    v_shaped = model.v_template + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas
    )
    joints = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)

    # pose blendshapes on (R - I)
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, NUM_POSE_FEAT)
    v_posed = v_shaped + jnp.einsum(
        "bp,pV->bV", pose_feature, model.posedirs
    ).reshape(B, NUM_VERTS, 3)

    posed_joints, A = _rigid_chain(rot_mats, joints)

    # skinning: T_v = sum_k w_vk A_k
    T_v = jnp.einsum("vk,bkij->bvij", model.lbs_weights, A)
    verts = (
        jnp.einsum("bvij,bvj->bvi", T_v[..., :3, :3], v_posed) + T_v[..., :3, 3]
    )

    tips = verts[:, list(TIP_VERTEX_IDS)]
    joints21 = jnp.concatenate([posed_joints, tips], axis=1)

    if transl is not None:
        verts = verts + transl[:, None, :]
        joints21 = joints21 + transl[:, None, :]
    return verts, joints21


def reorder_joints_manopth(joints21: jnp.ndarray) -> jnp.ndarray:
    """smplx/kinematic order -> manopth visualization order (manolayer.py:260)."""
    return joints21[..., list(JOINT_REORDER_MANOPTH), :]


# wrist-sealing (body_models.py:36-74): faces around the wrist ring closed
# with a centroid vertex 778
SEAL_FACES_R = np.array(
    [
        [120, 108, 778], [108, 79, 778], [79, 78, 778], [78, 121, 778],
        [121, 214, 778], [214, 215, 778], [215, 279, 778], [279, 239, 778],
        [239, 234, 778], [234, 92, 778], [92, 38, 778], [38, 122, 778],
        [122, 118, 778], [118, 117, 778], [117, 119, 778], [119, 120, 778],
    ],
    np.int32,
)
CIRCLE_V_ID = np.array(
    [108, 79, 78, 121, 214, 215, 279, 239, 234, 92, 38, 122, 118, 117, 119, 120],
    np.int64,
)


def seal_mano_mesh(v3d: jnp.ndarray, faces: np.ndarray, is_rhand: bool):
    """Append the wrist-ring centroid vertex + sealing faces
    (body_models.py:62-74). v3d (B, 778, 3) -> (B, 779, 3)."""
    seal = SEAL_FACES_R if is_rhand else SEAL_FACES_R[:, [1, 0, 2]]
    centers = jnp.mean(v3d[:, CIRCLE_V_ID], axis=1, keepdims=True)
    sealed = jnp.concatenate([v3d, centers], axis=1)
    return sealed, np.concatenate([faces, seal], axis=0)


def decimate_verts(verts: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """MANODecimator.downsample (body_models.py:10-31): verts (B, 778, 3)
    through a (195, 778) decimation matrix."""
    return jnp.einsum("sv,bvc->bsc", D, verts)
