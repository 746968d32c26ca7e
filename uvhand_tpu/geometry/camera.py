"""Camera utilities: weak-perspective <-> perspective, 2D projection,
translation solvers, rig/pose helpers.

Numerical contract from the reference:
  - `weak_perspective_to_perspective_torch` /root/reference/arctic_tools/common/camera.py:456
    t = [tx, ty, 2*f / (img_res * clamp(s, min_s) + 1e-9)]
  - `perspective_to_weak_perspective_torch` camera.py:10
  - `project2d_batch` /root/reference/arctic_tools/common/transforms.py:316
  - `normalize_kp2d` /root/reference/arctic_tools/common/data_utils.py:313
    (x,y) -> 2*xy/img_res - 1
  - `estimate_translation_np` camera.py:79 (confidence-weighted DLT; the
    K-matrix variant `estimate_translation_k` lives batched in
    `data/process.py` because the GT FK path runs it inside the fused
    train step every iteration)
  - rig helpers `get_default_cam_t` camera.py:74, `look_at:292`,
    `to_sphere:317`, `sample_pose_on_sphere:333`, `rectify_pose:349`,
    `get_coord_maps:260`. The reference solves per-sample in a numpy loop
    on host; everything here is batched jnp (vmap/solve on device) —
    samplers take explicit JAX PRNG keys instead of global numpy state.
"""

from __future__ import annotations

import jax
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


def get_default_cam_t(focal_length, img_res) -> jnp.ndarray:
    """Default camera translation = weak-persp [s=5, 0, 0] converted
    (camera.py:74-77)."""
    return perspective_from_weak(
        jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32), focal_length, img_res
    )


def perspective_from_weak(wp_cam, focal_length, img_res) -> jnp.ndarray:
    """`convert_weak_perspective_to_perspective` (camera.py:54-71): no min_s
    clamp, translation order [tx, ty, tz] from wp [s, tx, ty]."""
    s = wp_cam[..., 0]
    tz = 2.0 * focal_length / (img_res * s + 1e-9)
    return jnp.stack([wp_cam[..., 1], wp_cam[..., 2], tz], axis=-1)


def estimate_translation(
    S: jnp.ndarray,  # (..., N, 3) 3D joints (camera frame, unknown transl)
    joints_2d: jnp.ndarray,  # (..., N, 2) pixel targets
    joints_conf: jnp.ndarray,  # (..., N) confidences
    focal_length,  # (fx, fy)
    img_size,  # (H, W)
) -> jnp.ndarray:
    """Confidence-weighted linear solve for the camera translation that
    projects S onto joints_2d (`estimate_translation_np`, camera.py:79-123).

    The projection constraint per joint j and axis a in {x, y}:
        f_a * (S_ja + t_a) = (p_ja - c_a) * (S_jz + t_z)
    is linear in t — stack 2N rows, weight by sqrt(conf), solve the 3x3
    normal equations. The reference loops the batch in numpy on host
    (camera.py:166-174); this is closed-form batched on device.
    """
    f = jnp.asarray(focal_length, jnp.float32)  # (2,)
    center = jnp.asarray([img_size[1] / 2.0, img_size[0] / 2.0], jnp.float32)

    Z = S[..., 2:]  # (..., N, 1)
    XY = S[..., :2]  # (..., N, 2)
    # rows for (j, axis): Q = [f_a * e_a, (c_a - p_ja)], rhs = (p - c) Z - f XY
    w = jnp.sqrt(jnp.maximum(joints_conf, 0.0))[..., None]  # (..., N, 1)
    p_min_c = joints_2d - center
    # build per-axis row blocks then interleave-free stack on a new axis:
    # Q (..., N, 2, 3); rhs (..., N, 2)
    zeros = jnp.zeros_like(Z[..., 0])
    Qx = jnp.stack([jnp.broadcast_to(f[0], zeros.shape), zeros,
                    -p_min_c[..., 0] + 0.0], axis=-1)
    Qy = jnp.stack([zeros, jnp.broadcast_to(f[1], zeros.shape),
                    -p_min_c[..., 1] + 0.0], axis=-1)
    Q = jnp.stack([Qx, Qy], axis=-2) * w[..., None]  # (..., N, 2, 3)
    rhs = (p_min_c * Z - f * XY) * w  # (..., N, 2)
    Qf = Q.reshape(*Q.shape[:-3], -1, 3)  # (..., 2N, 3)
    rf = rhs.reshape(*rhs.shape[:-2], -1)  # (..., 2N)
    # HIGHEST: the TPU MXU's default bf16-ish precision costs ~1e-2 m of
    # translation accuracy in the 3x3 normal equations (verified on chip)
    hi = jax.lax.Precision.HIGHEST
    A = jnp.einsum("...ri,...rj->...ij", Qf, Qf, precision=hi)
    b = jnp.einsum("...ri,...r->...i", Qf, rf, precision=hi)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def look_at(eye, at=None, up=None, eps: float = 1e-5) -> jnp.ndarray:
    """Camera rotation whose -z looks from `eye` toward `at`
    (camera.py:292-314). eye (..., 3) -> (..., 3, 3) with columns
    [x_axis, y_axis, z_axis]."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.zeros(3, jnp.float32) if at is None else jnp.asarray(at, jnp.float32)
    up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32) if up is None else jnp.asarray(up, jnp.float32)

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    z_axis = norm(eye - at)
    x_axis = norm(jnp.cross(jnp.broadcast_to(up, z_axis.shape), z_axis))
    y_axis = norm(jnp.cross(z_axis, x_axis))
    return jnp.stack([x_axis, y_axis, z_axis], axis=-1)


def to_sphere(u, v) -> jnp.ndarray:
    """(u, v) in [0,1]^2 -> uniform point on the unit sphere
    (camera.py:317-324)."""
    theta = 2.0 * jnp.pi * u
    phi = jnp.arccos(1.0 - 2.0 * v)
    return jnp.stack(
        [jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta),
         jnp.cos(phi)], axis=-1)


def sample_pose_on_sphere(key, range_u=(0.0, 1.0), range_v=(0.0, 1.0),
                          radius=1.0, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Random camera-to-world [R | t] (3, 4) on a sphere around the origin
    (camera.py:327-345); explicit PRNG key replaces numpy global state."""
    ku, kv, kr = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (), minval=range_u[0], maxval=range_u[1])
    v = jax.random.uniform(kv, (), minval=range_v[0], maxval=range_v[1])
    if isinstance(radius, tuple):
        radius = jax.random.uniform(kr, (), minval=radius[0], maxval=radius[1])
    loc = to_sphere(u, v) * radius
    R = look_at(loc, up=jnp.asarray(up, jnp.float32))
    return jnp.concatenate([R, loc.reshape(3, 1)], axis=1)


def rectify_pose(camera_r: jnp.ndarray, body_aa: jnp.ndarray,
                 rotate_x: bool = False) -> jnp.ndarray:
    """Compose a camera rotation into a global-orient axis-angle
    (camera.py:349-358)."""
    from .rotations import axis_angle_to_matrix, matrix_to_axis_angle

    body_r = axis_angle_to_matrix(body_aa)
    if rotate_x:
        flip = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], jnp.float32)
        body_r = body_r @ flip
    return matrix_to_axis_angle(camera_r @ body_r)


def get_coord_maps(size: int = 56) -> jnp.ndarray:
    """CoordConv-style normalized (x, y) channel maps, (1, 2, size, size)
    in [-1, 1] (camera.py:260-289)."""
    r = jnp.arange(size, dtype=jnp.float32) / (size - 1) * 2.0 - 1.0
    xx = jnp.broadcast_to(r[None, :], (size, size))
    yy = jnp.broadcast_to(r[:, None], (size, size))
    return jnp.stack([xx, yy])[None]


def weak_perspective_intrinsics(focal_length: float, img_res: int) -> jnp.ndarray:
    """Fixed patch intrinsics used by the reference (focal 1000, 224x224).

    cf. `get_wp_intrix` /root/reference/arctic_tools/common/data_utils.py:329.
    """
    c = img_res // 2
    return jnp.array(
        [[focal_length, 0.0, c], [0.0, focal_length, c], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )
