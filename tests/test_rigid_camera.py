import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as SR

from uvhand_tpu.geometry import camera, rigid


def test_kabsch_recovers_known_transform(rng):
    B, N = 8, 21
    A = rng.normal(size=(B, N, 3)).astype(np.float32)
    R_gt = SR.from_rotvec(rng.normal(size=(B, 3))).as_matrix().astype(np.float32)
    t_gt = rng.normal(size=(B, 3, 1)).astype(np.float32)
    Bpts = np.einsum("bij,bnj->bni", R_gt, A) + t_gt.transpose(0, 2, 1)
    R, t = rigid.solve_rigid_transform(jnp.asarray(A), jnp.asarray(Bpts))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)
    dets = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)


def test_kabsch_reflection_case(rng):
    # Degenerate/noisy set that would produce det=-1 without the correction
    A = rng.normal(size=(4, 5, 3)).astype(np.float32)
    Bpts = rng.normal(size=(4, 5, 3)).astype(np.float32)
    R, _ = rigid.solve_rigid_transform(jnp.asarray(A), jnp.asarray(Bpts))
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)


def test_rigid_transform_batch(rng):
    pts = rng.normal(size=(2, 7, 3)).astype(np.float32)
    R = SR.from_rotvec(rng.normal(size=(2, 3))).as_matrix().astype(np.float32)
    T = rng.normal(size=(2, 3, 1)).astype(np.float32)
    out = np.asarray(rigid.rigid_transform_batch(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(T)))
    ref = np.einsum("bij,bnj->bni", R, pts) + T.transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_weak_perspective_roundtrip(rng):
    wp = np.abs(rng.normal(size=(16, 3))).astype(np.float32) + 0.2
    f, res = 1000.0, 224
    t = camera.weak_perspective_to_perspective(jnp.asarray(wp), f, res, min_s=0.1)
    wp_back = np.asarray(camera.perspective_to_weak_perspective(t, f, res))
    np.testing.assert_allclose(wp_back[:, 0], np.maximum(wp[:, 0], 0.1), rtol=1e-4)
    np.testing.assert_allclose(wp_back[:, 1:], wp[:, 1:], rtol=1e-5)


def test_min_s_clamp():
    wp = jnp.array([[0.01, 0.5, -0.5]], jnp.float32)
    t = camera.weak_perspective_to_perspective(wp, 1000.0, 224, min_s=0.1)
    # s clamped to 0.1 -> tz = 2*1000/(224*0.1)
    np.testing.assert_allclose(float(t[0, 2]), 2 * 1000.0 / (224 * 0.1 + 1e-9), rtol=1e-5)


def test_project_normalize(rng):
    K = np.array([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]], np.float32)[None].repeat(3, 0)
    pts = rng.normal(size=(3, 21, 3)).astype(np.float32)
    pts[..., 2] += 5.0
    p2d = np.asarray(camera.project2d(jnp.asarray(K), jnp.asarray(pts)))
    ref = (pts[..., :2] / pts[..., 2:]) * 1000.0 + 112.0
    np.testing.assert_allclose(p2d, ref, rtol=1e-4)
    norm = np.asarray(camera.normalize_kp2d(jnp.asarray(p2d), 224))
    np.testing.assert_allclose(np.asarray(camera.unnormalize_kp2d(jnp.asarray(norm), 224)), p2d, rtol=1e-4)
