"""Weak-perspective <-> perspective camera utilities and 2D projection.

Numerical contract from the reference:
  - `weak_perspective_to_perspective_torch` /root/reference/arctic_tools/common/camera.py:456
    t = [tx, ty, 2*f / (img_res * clamp(s, min_s) + 1e-9)]
  - `perspective_to_weak_perspective_torch` camera.py:10
  - `project2d_batch` /root/reference/arctic_tools/common/transforms.py:316
  - `normalize_kp2d` /root/reference/arctic_tools/common/data_utils.py:313
    (x,y) -> 2*xy/img_res - 1
"""

from __future__ import annotations

import jax.numpy as jnp


def weak_perspective_to_perspective(
    wp_cam: jnp.ndarray, focal_length, img_res, min_s: float = 0.1
) -> jnp.ndarray:
    """wp_cam (..., 3) = [s, tx, ty] -> camera translation [tx, ty, tz]."""
    s = jnp.clip(wp_cam[..., 0], min=min_s)
    tx = wp_cam[..., 1]
    ty = wp_cam[..., 2]
    tz = 2.0 * focal_length / (img_res * s + 1e-9)
    return jnp.stack([tx, ty, tz], axis=-1)


def perspective_to_weak_perspective(
    cam_t: jnp.ndarray, focal_length, img_res
) -> jnp.ndarray:
    """cam_t (..., 3) = [tx, ty, tz] -> weak-perspective [s, tx, ty]."""
    s = 2.0 * focal_length / (img_res * cam_t[..., 2] + 1e-9)
    return jnp.stack([s, cam_t[..., 0], cam_t[..., 1]], axis=-1)


def project2d(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """K (..., 3, 3), pts_cam (..., N, 3) -> pixel coords (..., N, 2)."""
    homo = jnp.einsum("...ij,...nj->...ni", K, pts_cam)
    return homo[..., :2] / jnp.maximum(homo[..., 2:], 1e-9)


def normalize_kp2d(kp2d: jnp.ndarray, img_res) -> jnp.ndarray:
    """Pixel coords -> [-1, 1] normalized (reference convention 2*p/res - 1)."""
    return 2.0 * kp2d / img_res - 1.0


def unnormalize_kp2d(kp2d_norm: jnp.ndarray, img_res) -> jnp.ndarray:
    return 0.5 * img_res * (kp2d_norm + 1.0)


def weak_perspective_intrinsics(focal_length: float, img_res: int) -> jnp.ndarray:
    """Fixed patch intrinsics used by the reference (focal 1000, 224x224).

    cf. `get_wp_intrix` /root/reference/arctic_tools/common/data_utils.py:329.
    """
    c = img_res // 2
    return jnp.array(
        [[focal_length, 0.0, c], [0.0, focal_length, c], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )
