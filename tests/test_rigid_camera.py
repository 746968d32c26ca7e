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


def _estimate_translation_np_oracle(S, joints_2d, conf, focal_length, img_size):
    """Reference weighted-DLT solver, per sample (camera.py:79-123)."""
    n = S.shape[0]
    f = np.array([focal_length[0], focal_length[1]])
    center = np.array([img_size[1] / 2.0, img_size[0] / 2.0])
    Z = np.reshape(np.tile(S[:, 2], (2, 1)).T, -1)
    XY = np.reshape(S[:, 0:2], -1)
    O = np.tile(center, n)
    F = np.tile(f, n)
    w2 = np.reshape(np.tile(np.sqrt(conf), (2, 1)).T, -1)
    Q = np.array([
        F * np.tile(np.array([1, 0]), n),
        F * np.tile(np.array([0, 1]), n),
        O - np.reshape(joints_2d, -1),
    ]).T
    c = (np.reshape(joints_2d, -1) - O) * Z - F * XY
    W = np.diagflat(w2)
    Q = W @ Q
    c = W @ c
    return np.linalg.solve(Q.T @ Q, Q.T @ c)


def test_estimate_translation_recovers_exact(rng):
    B, N = 4, 21
    f, size = (1000.0, 1000.0), (224, 224)
    S = rng.normal(size=(B, N, 3)).astype(np.float64)
    t_gt = rng.normal(size=(B, 3)).astype(np.float64)
    t_gt[:, 2] += 6.0
    P = S + t_gt[:, None]
    p2d = P[..., :2] / P[..., 2:] * f[0] + np.array([size[1] / 2, size[0] / 2])
    conf = np.ones((B, N))
    t = np.asarray(camera.estimate_translation(
        jnp.asarray(S, jnp.float32), jnp.asarray(p2d, jnp.float32),
        jnp.asarray(conf, jnp.float32), f, size))
    np.testing.assert_allclose(t, t_gt, rtol=2e-3, atol=2e-3)


def test_estimate_translation_matches_reference_solver(rng):
    B, N = 5, 17
    f, size = (900.0, 1100.0), (600, 840)
    S = rng.normal(size=(B, N, 3)).astype(np.float64)
    S[..., 2] += 4.0
    p2d = rng.uniform(0, 800, size=(B, N, 2)).astype(np.float64)
    conf = rng.uniform(0.1, 1.0, size=(B, N)).astype(np.float64)
    ours = np.asarray(camera.estimate_translation(
        jnp.asarray(S, jnp.float32), jnp.asarray(p2d, jnp.float32),
        jnp.asarray(conf, jnp.float32), f, size))
    ref = np.stack([
        _estimate_translation_np_oracle(S[i], p2d[i], conf[i], f, size)
        for i in range(B)
    ])
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_estimate_translation_ignores_zero_conf(rng):
    N = 21
    f, size = (1000.0, 1000.0), (224, 224)
    S = rng.normal(size=(N, 3))
    t_gt = np.array([0.3, -0.2, 5.0])
    P = S + t_gt
    p2d = P[..., :2] / P[..., 2:] * f[0] + size[0] / 2
    p2d[:5] = 1e6  # garbage observations...
    conf = np.ones(N)
    conf[:5] = 0.0  # ...with zero confidence must not affect the solution
    t = np.asarray(camera.estimate_translation(
        jnp.asarray(S, jnp.float32), jnp.asarray(p2d, jnp.float32),
        jnp.asarray(conf, jnp.float32), f, size))
    np.testing.assert_allclose(t, t_gt, rtol=2e-3, atol=2e-3)


def test_look_at_and_sphere(rng):
    import jax

    eye = rng.normal(size=(6, 3)).astype(np.float32) * 3.0
    R = np.asarray(camera.look_at(jnp.asarray(eye)))
    # orthonormal, right-handed, z-axis along eye-at
    np.testing.assert_allclose(
        np.einsum("bij,bik->bjk", R, R), np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    z = eye / np.linalg.norm(eye, axis=-1, keepdims=True)
    np.testing.assert_allclose(R[..., 2], z, atol=1e-5)

    s = np.asarray(camera.to_sphere(jnp.asarray(0.3), jnp.asarray(0.7)))
    np.testing.assert_allclose(np.linalg.norm(s), 1.0, atol=1e-6)

    RT = np.asarray(camera.sample_pose_on_sphere(
        jax.random.PRNGKey(0), radius=(2.0, 3.0)))
    assert RT.shape == (3, 4)
    r = np.linalg.norm(RT[:, 3])
    assert 2.0 <= r <= 3.0
    np.testing.assert_allclose(
        RT[:, :3].T @ RT[:, :3], np.eye(3), atol=1e-5)


def test_rectify_pose_identity_and_compose(rng):
    from scipy.spatial.transform import Rotation as SR

    aa = rng.normal(size=(4, 3)).astype(np.float32) * 0.5
    out = np.asarray(camera.rectify_pose(jnp.eye(3), jnp.asarray(aa)))
    np.testing.assert_allclose(
        SR.from_rotvec(out).as_matrix(), SR.from_rotvec(aa).as_matrix(),
        atol=1e-5)
    cam_r = SR.from_rotvec(rng.normal(size=3)).as_matrix().astype(np.float32)
    out = np.asarray(camera.rectify_pose(jnp.asarray(cam_r), jnp.asarray(aa)))
    ref = cam_r @ SR.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(SR.from_rotvec(out).as_matrix(), ref, atol=1e-5)


def test_coord_maps_and_default_cam():
    m = np.asarray(camera.get_coord_maps(4))
    assert m.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(m[0, 0, 0], np.array([-1, -1 / 3, 1 / 3, 1.0]), atol=1e-6)
    np.testing.assert_allclose(m[0, 1, :, 0], np.array([-1, -1 / 3, 1 / 3, 1.0]), atol=1e-6)

    t = np.asarray(camera.get_default_cam_t(1000.0, 224))
    np.testing.assert_allclose(t, [[0.0, 0.0, 2 * 1000.0 / (224 * 5.0 + 1e-9)]], rtol=1e-6)
