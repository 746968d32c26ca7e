"""Rotation representation conversions in pure JAX.

Capability parity with the reference's pytorch3d-derived conversion suite
(`/root/reference/arctic_tools/common/rot.py`) and manopth's Rodrigues layer
(`/root/reference/manopth/rodrigues_layer.py`), re-implemented from the
underlying math (Rodrigues' formula, Shepperd's quaternion extraction,
Zhou et al. 6D representation). All functions are batched over arbitrary
leading dimensions, jit/vmap/grad-safe, and numerically stable at small
angles via Taylor fallbacks (no data-dependent branching).

Conventions (matching the reference):
  - quaternions are (w, x, y, z), w >= 0 after `standardize_quaternion`
  - axis-angle vectors encode angle * unit_axis (radians)
  - matrices act on column vectors: p' = R @ p
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Force the real part to be non-negative (q and -q are the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate `point` (..., 3) by quaternion `q` (..., 4)."""
    zeros = jnp.zeros_like(point[..., :1])
    p = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_multiply(quaternion_multiply(q, p), quaternion_invert(q))
    return out[..., 1:]


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a subgradient of 0 at x=0."""
    positive = x > 0
    safe = jnp.where(positive, x, jnp.ones_like(x))
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Shepperd-style extraction: pick the best-conditioned of 4 candidates."""
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4, quat_candidates.dtype)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return standardize_quaternion(out)


def jax_one_hot(idx: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    return (idx[..., None] == jnp.arange(n)).astype(dtype)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    small = jnp.abs(angles) < _EPS
    # sin(x/2)/x, with Taylor 0.5 - x^2/48 near zero
    safe = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / safe
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half
    small = jnp.abs(angles) < _EPS
    safe = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / safe
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. continuous 6D -> rotation matrix (Gram-Schmidt)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    def axis_rot(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
        if axis == "X":
            rows = [one, zero, zero, zero, c, -s, zero, s, c]
        elif axis == "Y":
            rows = [c, zero, s, zero, one, zero, -s, zero, c]
        else:
            rows = [c, -s, zero, s, c, zero, zero, zero, one]
        return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))

    mats = [axis_rot(c, euler[..., i]) for i, c in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def rotate_about_axis(radian: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix for `radian` (...,) about a fixed unit `axis` (3,)."""
    aa = radian[..., None] * axis
    return axis_angle_to_matrix(aa)
