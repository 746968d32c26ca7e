"""Adaptive inverse kinematics: 21 hand joints -> 48-d MANO axis-angle pose.

Capability parity with `adaptive_IK` (`/root/reference/AIK/AIK_torch.py:83-188`)
and its config (`/root/reference/AIK/AIK_config.py`). The reference loops over
the batch in Python and runs per-joint torch ops; here the whole solve is a
single vmapped, jittable function (the 15-step kinematic recursion is a fixed
unrolled chain of 3x3 ops — XLA fuses it into one kernel).

Joint order is SNAP/bihand 21-keypoint order:
  0 wrist, 1-4 thumb, 5-8 index, 9-12 middle, 13-16 ring, 17-20 pinky.
The input is assumed root-aligned to the template wrist (the reference sets
q[0] = T[0] and notes P[0] == T[0]).

Twist about the bone axis is unobservable from joint positions and set to 0
(same as the reference, `angels0`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import axis_angle_to_matrix, matrix_to_axis_angle

SNAP_PARENT = (
    0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19,
)
KINEMATIC_TREE = (2, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 18, 19, 20)
# SNAP joint id -> MANO pose slot (1..15); slot 0 is the global orientation
ID2ROT = {
    2: 13, 3: 14, 4: 15,
    6: 1, 7: 2, 8: 3,
    10: 4, 11: 5, 12: 6,
    14: 10, 15: 11, 16: 12,
    18: 7, 19: 8, 20: 9,
}
PALM_JOINTS = (1, 5, 9, 13, 17)  # finger bases used for the global fit

# SNAP hand template keypoints (mm), bihand/SNAP lineage (AIK_config.py)
TEMPLATE_RIGHT = np.array(
    [
        [95.66992, 6.383429, 6.186305],
        [71.58023, -9.138906, 31.999151],
        [51.946987, -8.24762, 55.698708],
        [29.729244, -13.680591, 70.222824],
        [2.2312577, -18.095005, 90.9145],
        [7.5726805, 1.1830721, 26.872293],
        [-25.106222, 5.192427, 29.089361],
        [-47.262135, 3.894005, 28.975246],
        [-70.5249, 4.6119733, 33.024513],
        [1.0094867, 4.9044657, 2.8287644],
        [-30.173185, 6.765794, -2.7657442],
        [-53.077824, 5.5136905, -6.7102585],
        [-78.99283, 6.146649, -12.040861],
        [13.934374, 2.4260077, -20.486887],
        [-14.3799, 4.493015, -25.585424],
        [-37.90041, 2.8049028, -33.219242],
        [-60.804226, 7.343061, -40.20221],
        [26.882961, -3.5568998, -37.023037],
        [9.868553, -3.495075, -49.521812],
        [-5.9983487, -4.1862307, -59.853718],
        [-21.898844, -1.6281177, -70.131676],
    ],
    np.float32,
)
TEMPLATE_LEFT = TEMPLATE_RIGHT * np.array([-1.0, 1.0, 1.0], np.float32)


def _swing_matrix(delta_t: jnp.ndarray, delta_p: jnp.ndarray) -> jnp.ndarray:
    """Rotation taking template bone delta_t onto predicted bone delta_p."""
    axis_raw = jnp.cross(delta_t, delta_p)
    axis = axis_raw / (jnp.linalg.norm(axis_raw) + 1e-8)
    denom = (jnp.linalg.norm(delta_t) + 1e-8) * (jnp.linalg.norm(delta_p) + 1e-8)
    cos_a = jnp.clip(jnp.dot(delta_t, delta_p) / denom, -1.0, 1.0)
    alpha = jnp.arccos(cos_a)
    return axis_angle_to_matrix(axis * alpha)


def _global_fit(T: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Arun fit on the 5 palm bones (AIK_torch.py:118-141)."""
    idx = np.array(PALM_JOINTS)
    T0 = (T[idx] - T[0]).T  # (3, 5)
    P0 = (P[idx] - P[0]).T
    H = jnp.einsum("in,jn->ij", T0, P0, precision=jax.lax.Precision.HIGHEST)
    U, S, Vt = jnp.linalg.svd(H)
    V = Vt.T
    R0 = V @ U.T
    det = jnp.linalg.det(R0)
    # reference flips only when det==-1 AND H is near-singular
    flip = jnp.logical_and(det < 0, jnp.any(jnp.abs(S) < 1e-4))
    V_fixed = jnp.where(flip, V.at[:, 2].mul(-1.0), V)
    return V_fixed @ U.T


def _solve_single(P: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """One sample: P (21, 3) -> pose (48,) axis-angle."""
    R0 = _global_fit(T, P)

    R = [None] * 21
    R[0] = R0
    for k in PALM_JOINTS:
        R[k] = R0
    q = [None] * 21
    q[0] = T[0]

    local = {}
    for k in KINEMATIC_TREE:
        pa = SNAP_PARENT[k]
        pa_pa = SNAP_PARENT[pa]
        if q[pa] is None:
            q[pa] = R[pa] @ (T[pa] - T[pa_pa]) + q[pa_pa]
        delta_p = R[pa].T @ (P[k] - q[pa])
        delta_t = T[k] - T[pa]
        D_sw = _swing_matrix(delta_t, delta_p)
        local[k] = D_sw
        R[k] = R[pa] @ D_sw

    pose_R = [jnp.eye(3)] * 16
    pose_R[0] = R0
    for k, slot in ID2ROT.items():
        pose_R[slot] = local[k]
    return matrix_to_axis_angle(jnp.stack(pose_R)).reshape(48)


def adaptive_ik(P: jnp.ndarray, template: jnp.ndarray | None = None, side: str = "right") -> jnp.ndarray:
    """Batched IK: P (B, 21, 3) root-aligned joints -> (B, 48) MANO pose."""
    if template is None:
        template = jnp.asarray(TEMPLATE_RIGHT if side == "right" else TEMPLATE_LEFT)
    return jax.vmap(lambda p: _solve_single(p, template))(P)


def aik_fk(pose48: jnp.ndarray, template: jnp.ndarray | None = None, side: str = "right") -> jnp.ndarray:
    """Forward kinematics with the IK's own convention (for round-trip tests).

    q[k] = q[parent] + R[k] @ (T[k] - T[parent]),  R = cumulative rotations.
    """
    if template is None:
        template = jnp.asarray(TEMPLATE_RIGHT if side == "right" else TEMPLATE_LEFT)
    T = template

    def single(pose):
        mats = axis_angle_to_matrix(pose.reshape(16, 3))
        R = [None] * 21
        R[0] = mats[0]
        for k in PALM_JOINTS:
            R[k] = mats[0]
        for k in KINEMATIC_TREE:
            R[k] = R[SNAP_PARENT[k]] @ mats[ID2ROT[k]]
        q = [None] * 21
        q[0] = T[0]
        for k in range(1, 21):
            pa = SNAP_PARENT[k]
            q[k] = q[pa] + R[k] @ (T[k] - T[pa])
        return jnp.stack(q)

    return jax.vmap(single)(pose48)
