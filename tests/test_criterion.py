"""Criterion consistency: perfect predictions drive param losses to ~0,
gradients are finite, masked-valid semantics hold."""

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.geometry import camera, mano, objects
from uvhand_tpu.losses import criterion as crit

B, T, Q, L, C = 2, 3, 8, 2, 14
IMG_RES = 224.0


def make_world(rng):
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    return mano_r, mano_l, bank


def make_targets(rng, mano_r, mano_l, bank):
    K = jnp.tile(camera.weak_perspective_intrinsics(1000.0, 224)[None], (B, 1, 1))
    avg_f = 1000.0

    pose_r = jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32)
    pose_l = jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32)
    beta_r = jnp.asarray(rng.normal(scale=0.5, size=(B, 10)), jnp.float32)
    beta_l = jnp.asarray(rng.normal(scale=0.5, size=(B, 10)), jnp.float32)
    wp_r = jnp.asarray(np.stack([np.full(B, 0.8), rng.normal(size=B) * 0.05, rng.normal(size=B) * 0.05], 1), jnp.float32)
    wp_l = wp_r + 0.05
    wp_o = wp_r - 0.03
    rot_o = jnp.asarray(rng.normal(scale=0.3, size=(B, 3)), jnp.float32)
    rad_o = jnp.asarray(np.abs(rng.normal(scale=0.4, size=B)), jnp.float32)
    query_idx = jnp.asarray([2, 4])

    def hand_gt(model, pose, beta, wp):
        cam_t = camera.weak_perspective_to_perspective(wp, avg_f, IMG_RES)
        v, j = mano.mano_forward(model, pose[:, :3], pose[:, 3:], beta, flat_hand_mean=False)
        j3d = j + cam_t[:, None, :]
        j2d = camera.normalize_kp2d(camera.project2d(K, j3d), IMG_RES)
        return j3d, j2d

    j3d_r, j2d_r = hand_gt(mano_r, pose_r, beta_r, wp_r)
    j3d_l, j2d_l = hand_gt(mano_l, pose_l, beta_l, wp_l)

    cam_t_o = camera.weak_perspective_to_perspective(wp_o, avg_f, IMG_RES)
    obj = objects.object_forward(bank, rad_o, rot_o, query_idx)
    kp3d_o = obj["kp3d"] + cam_t_o[:, None, :]
    kp2d_o = camera.normalize_kp2d(camera.project2d(K, kp3d_o), IMG_RES)

    rng2 = np.random.default_rng(7)
    return {
        "labels": jnp.asarray([[12, 13, 3], [12, 13, 5]], jnp.int32),
        "keypoints": jnp.asarray(rng2.uniform(-1, 1, (B, T, 42)), jnp.float32),
        "target_valid": jnp.ones((B, T), bool),
        "is_valid": jnp.ones((B,), jnp.float32),
        "left_valid": jnp.ones((B,), jnp.float32),
        "right_valid": jnp.ones((B,), jnp.float32),
        "joints_valid_r": jnp.ones((B, 21), jnp.float32),
        "joints_valid_l": jnp.ones((B, 21), jnp.float32),
        "mano.pose.r": pose_r, "mano.pose.l": pose_l,
        "mano.beta.r": beta_r, "mano.beta.l": beta_l,
        "mano.j3d.cam.r": j3d_r, "mano.j3d.cam.l": j3d_l,
        "mano.j2d.norm.r": j2d_r, "mano.j2d.norm.l": j2d_l,
        "mano.cam_t.wp.r": wp_r, "mano.cam_t.wp.l": wp_l,
        "object.kp3d.cam": kp3d_o, "object.kp2d.norm": kp2d_o,
        "object.rot": rot_o, "object.radian": rad_o,
        "object.cam_t.wp": wp_o,
        "dist.ro": jnp.ones((B, 778), jnp.float32),  # no contact
        "dist.lo": jnp.ones((B, 778), jnp.float32),
        "idx.ro": jnp.zeros((B, 778), jnp.int32),
        "idx.lo": jnp.zeros((B, 778), jnp.int32),
        "intrinsics": K,
        "query_idx": query_idx,
    }, dict(pose_r=pose_r, pose_l=pose_l, beta_r=beta_r, beta_l=beta_l,
            wp_r=wp_r, wp_l=wp_l, wp_o=wp_o, rot_o=rot_o, rad_o=rad_o)


def perfect_outputs(gtp):
    logits = np.full((L, B, Q, C), -10.0, np.float32)
    logits[:, :, 0, 12] = 10.0
    logits[:, :, 1, 13] = 10.0
    logits[:, 0, 2, 3] = 10.0
    logits[:, 1, 2, 5] = 10.0

    pose = np.zeros((L, B, Q, 48), np.float32)
    beta = np.zeros((L, B, Q, 10), np.float32)
    hand_cam = np.zeros((L, B, Q, 3), np.float32)
    obj_cam = np.zeros((L, B, Q, 3), np.float32)
    obj_rot = np.zeros((L, B, Q, 3), np.float32)
    obj_rad = np.zeros((L, B, Q, 1), np.float32)
    pose[:, :, 0] = np.asarray(gtp["pose_l"])
    pose[:, :, 1] = np.asarray(gtp["pose_r"])
    beta[:, :, 0] = np.asarray(gtp["beta_l"])
    beta[:, :, 1] = np.asarray(gtp["beta_r"])
    hand_cam[:, :, 0] = np.asarray(gtp["wp_l"])
    hand_cam[:, :, 1] = np.asarray(gtp["wp_r"])
    obj_cam[:, :, 2] = np.asarray(gtp["wp_o"])
    obj_rot[:, :, 2] = np.asarray(gtp["rot_o"])
    obj_rad[:, :, 2, 0] = np.asarray(gtp["rad_o"])

    stacked = {
        "pred_logits": jnp.asarray(logits),
        "pred_hand_key": jnp.zeros((L, B, Q, 42), jnp.float32),
        "pred_obj_key": jnp.zeros((L, B, Q, 42), jnp.float32),
        "pred_mano_pose": jnp.asarray(pose),
        "pred_mano_beta": jnp.asarray(beta),
        "pred_hand_cam": jnp.asarray(hand_cam),
        "pred_obj_cam": jnp.asarray(obj_cam),
        "pred_obj_rot": jnp.asarray(obj_rot),
        "pred_obj_rad": jnp.asarray(obj_rad),
    }
    return {"stacked": stacked}


def test_perfect_predictions_zero_param_losses(rng):
    mano_r, mano_l, bank = make_world(rng)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    outputs = perfect_outputs(gtp)
    total, ld = crit.arctic_criterion(
        outputs, targets, mano_r, mano_l, bank, two_stage=True
    )
    for k in ["loss/mano/pose/r", "loss/mano/pose/l", "loss/mano/beta/r",
              "loss/mano/kp3d/r", "loss/mano/kp3d/l", "loss/mano/kp2d/r",
              "loss/mano/cam_t/r", "loss/object/kp3d", "loss/object/kp2d",
              "loss/object/rot", "loss/object/radian", "loss/object/cam_t",
              "loss/object/transl", "loss/mano/transl/l", "loss/cd"]:
        assert float(ld[k]) < 1e-8, (k, float(ld[k]))
    assert np.isfinite(float(total))


def test_random_predictions_finite_and_positive(rng):
    mano_r, mano_l, bank = make_world(rng)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    outputs = perfect_outputs(gtp)
    st = {k: v + 0.1 * jnp.asarray(np.random.default_rng(0).normal(size=v.shape), jnp.float32)
          for k, v in outputs["stacked"].items()}
    total, ld = crit.arctic_criterion({"stacked": st}, targets, mano_r, mano_l, bank)
    assert np.isfinite(float(total)) and float(total) > 0
    # per-aux keys exist
    assert "loss_ce_0" in ld and "loss_ce" in ld


def test_gradients_finite(rng):
    mano_r, mano_l, bank = make_world(rng)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    outputs = perfect_outputs(gtp)

    def loss_fn(st):
        return crit.arctic_criterion({"stacked": st}, targets, mano_r, mano_l, bank)[0]

    g = jax.grad(loss_fn)(outputs["stacked"])
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_invalid_samples_masked(rng):
    mano_r, mano_l, bank = make_world(rng)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    targets["left_valid"] = jnp.zeros((B,), jnp.float32)
    outputs = perfect_outputs(gtp)
    st = dict(outputs["stacked"])
    # corrupt left-hand prediction: must NOT affect left losses when invalid
    st["pred_mano_pose"] = st["pred_mano_pose"].at[:, :, 0].add(5.0)
    total, ld = crit.arctic_criterion({"stacked": st}, targets, mano_r, mano_l, bank)
    assert float(ld["loss/mano/pose/l"]) == 0.0
    assert float(ld["loss/mano/transl/l"]) == 0.0
    assert np.isfinite(float(total))
