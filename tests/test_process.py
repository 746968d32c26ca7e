"""GT preprocessing consistency: synthetic scene round-trips."""

import numpy as np
import jax.numpy as jnp

from uvhand_tpu.data import process
from uvhand_tpu.geometry import camera, mano, objects, rotations, rigid


def test_estimate_translation_k_recovers_truth(rng):
    B, N = 4, 16
    K = jnp.tile(camera.weak_perspective_intrinsics(1000.0, 224)[None], (B, 1, 1))
    S = jnp.asarray(rng.normal(scale=0.1, size=(B, N, 3)), jnp.float32)
    t_gt = jnp.asarray(
        np.stack([rng.normal(size=B) * 0.05, rng.normal(size=B) * 0.05, rng.uniform(0.4, 0.9, B)], 1),
        jnp.float32,
    )
    kp2d = camera.project2d(K, S + t_gt[:, None])
    t_est = process.estimate_translation_k(S, kp2d, K)
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_gt), atol=1e-3)


def test_nearest_point_fields(rng):
    B, N, M = 2, 10, 20
    src = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    dst = jnp.asarray(rng.normal(size=(B, M, 3)), jnp.float32)
    mask = np.ones((B, M), np.float32)
    mask[:, 15:] = 0  # padded tail
    dist, idx = process.nearest_point_fields(src, dst, jnp.asarray(mask))
    d2 = ((np.asarray(src)[:, :, None] - np.asarray(dst)[:, None]) ** 2).sum(-1)
    d2[:, :, 15:] = np.inf
    np.testing.assert_allclose(np.asarray(idx), d2.argmin(-1))
    np.testing.assert_allclose(np.asarray(dist), np.sqrt(d2.min(-1)), rtol=1e-4)


def test_process_targets_self_consistent(rng):
    """Build a scene in camera space from known params; process_targets must
    recover camera translations and camera-space GT consistently."""
    B = 2
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    K = jnp.tile(camera.weak_perspective_intrinsics(1000.0, 224)[None], (B, 1, 1))

    pose_r = jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32)
    pose_l = jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32)
    beta_r = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)), jnp.float32)
    beta_l = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)), jnp.float32)
    rot_o = jnp.asarray(rng.normal(scale=0.3, size=(B, 3)), jnp.float32)
    rad_o = jnp.asarray(np.abs(rng.normal(scale=0.3, size=B)), jnp.float32)
    query_idx = jnp.asarray([1, 3])

    # scene transform: camera = R_cam @ cano + t_cam
    aa_cam = jnp.asarray(rng.normal(scale=0.4, size=(B, 3)), jnp.float32)
    R_cam = rotations.axis_angle_to_matrix(aa_cam)
    t_cam = jnp.asarray(
        np.stack([rng.normal(size=B) * 0.03, rng.normal(size=B) * 0.03, rng.uniform(0.5, 0.8, B)], 1),
        jnp.float32,
    )

    obj = objects.object_forward(bank, rad_o, rot_o, query_idx)
    nk = obj["kp3d"].shape[1] // 2
    kp3d_b_cano = obj["kp3d"][:, nk:]
    kp3d_b_cam = jnp.einsum("bij,bnj->bni", R_cam, kp3d_b_cano) + t_cam[:, None]

    _, j_r = mano.mano_forward(mano_r, pose_r[:, :3], pose_r[:, 3:], beta_r, flat_hand_mean=False)
    _, j_l = mano.mano_forward(mano_l, pose_l[:, :3], pose_l[:, 3:], beta_l, flat_hand_mean=False)
    # place hands rigidly in the same scene
    off_r = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
    off_l = jnp.asarray([[-0.1, 0.0, 0.0]], jnp.float32)
    j_r_cam = jnp.einsum("bij,bnj->bni", R_cam, j_r + off_r) + t_cam[:, None]
    j_l_cam = jnp.einsum("bij,bnj->bni", R_cam, j_l + off_l) + t_cam[:, None]

    # GT 2D of object bottom kps: project the cano-space object at the
    # translation that process_targets should recover (cano space + transl)
    transl_true = jnp.asarray(
        np.stack([rng.normal(size=B) * 0.02, rng.normal(size=B) * 0.02, rng.uniform(0.5, 0.8, B)], 1),
        jnp.float32,
    )
    kp2d_b = camera.project2d(K, kp3d_b_cano + transl_true[:, None])

    targets = {
        "mano.pose.r": pose_r, "mano.pose.l": pose_l,
        "mano.beta.r": beta_r, "mano.beta.l": beta_l,
        "mano.j3d.full.r": j_r_cam, "mano.j3d.full.l": j_l_cam,
        "object.kp3d.full.b": kp3d_b_cam,
        "object.kp2d.norm.b": camera.normalize_kp2d(kp2d_b, 224.0),
        "object.kp2d.norm.t": camera.normalize_kp2d(kp2d_b, 224.0),  # placeholder
        "object.rot": rot_o, "object.radian": rad_o,
        "query_idx": query_idx, "intrinsics": K,
    }
    out = process.process_targets(targets, mano_r, mano_l, bank)

    # recovered object cam translation == the one used to synthesize 2D
    np.testing.assert_allclose(np.asarray(out["object.cam_t"]), np.asarray(transl_true), atol=2e-3)
    # hand joints mapped into object-cano + transl: the relative offset from
    # the object must be preserved (rigid map preserves relative geometry)
    rel_pred = np.asarray(out["mano.j3d.cam.r"] - out["object.kp3d.cam"][:, nk:nk+1])
    rel_true = np.asarray(j_r_cam - kp3d_b_cam[:, :1])
    # both expressed in different frames but with same norms
    np.testing.assert_allclose(
        np.linalg.norm(rel_pred, axis=-1), np.linalg.norm(rel_true, axis=-1), atol=1e-3
    )
    # wp cams round-trip
    wp = np.asarray(out["object.cam_t.wp"])
    back = np.asarray(
        camera.weak_perspective_to_perspective(jnp.asarray(wp), 1000.0, 224.0)
    )
    np.testing.assert_allclose(back, np.asarray(out["object.cam_t"]), atol=1e-4)
    # contact fields shapes
    assert out["dist.ro"].shape == (B, 778)
    assert out["idx.ro"].shape == (B, 778)
