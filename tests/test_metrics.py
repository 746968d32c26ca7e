"""Metrics: perfect predictions -> zero errors; NaN semantics for invalid."""

import numpy as np
import jax.numpy as jnp

from uvhand_tpu.evaluation import metrics as M
from uvhand_tpu.evaluation.decode import decode_predictions
from uvhand_tpu.geometry import camera, mano, objects

B = 3


def build(rng):
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    K = jnp.tile(camera.weak_perspective_intrinsics(1000.0, 224)[None], (B, 1, 1))
    sel = {
        "pose.r": jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32),
        "pose.l": jnp.asarray(rng.normal(scale=0.2, size=(B, 48)), jnp.float32),
        "beta.r": jnp.asarray(rng.normal(scale=0.3, size=(B, 10)), jnp.float32),
        "beta.l": jnp.asarray(rng.normal(scale=0.3, size=(B, 10)), jnp.float32),
        "root.r": jnp.asarray([[0.8, 0.01, 0.02]] * B, jnp.float32),
        "root.l": jnp.asarray([[0.85, -0.01, 0.02]] * B, jnp.float32),
        "root.o": jnp.asarray([[0.75, 0.0, 0.0]] * B, jnp.float32),
        "obj_rot": jnp.asarray(rng.normal(scale=0.3, size=(B, 3)), jnp.float32),
        "obj_rad": jnp.asarray(np.abs(rng.normal(scale=0.3, size=B)), jnp.float32),
    }
    meta = {"intrinsics": K, "query_idx": jnp.asarray([0, 1, 2])}
    pred = decode_predictions(sel, meta, mano_r, mano_l, bank)
    targets = dict(pred)
    targets.update({
        "is_valid": jnp.ones((B,), jnp.float32),
        "left_valid": jnp.ones((B,), jnp.float32),
        "right_valid": jnp.ones((B,), jnp.float32),
        "object.diameter": pred["object.diameter"],
        "object.parts_ids": pred["object.parts_ids"],
        "dist.ro": jnp.ones((B, 778), jnp.float32),
        "dist.lo": jnp.ones((B, 778), jnp.float32),
        "idx.ro": jnp.zeros((B, 778), jnp.int32),
        "idx.lo": jnp.zeros((B, 778), jnp.int32),
    })
    return pred, targets


def test_perfect_pred_zero_errors(rng):
    pred, targets = build(rng)
    out = M.measure_error(pred, targets)
    assert float(np.nanmax(np.asarray(out["mpjpe/ra/h"]))) < 1e-3
    assert float(np.nanmax(np.asarray(out["mrrpe/r/l"]))) < 1e-3
    assert float(np.nanmax(np.asarray(out["mrrpe/r/o"]))) < 1e-3
    assert float(np.nanmin(np.asarray(out["success_rate/0.05"]))) == 100.0
    assert float(np.nanmax(np.asarray(out["aae"]))) < 1e-4
    # no contacts anywhere -> cdev all NaN
    assert np.isnan(np.asarray(out["cdev/ho"])).all()


def test_perturbed_pred_positive_errors(rng):
    pred, targets = build(rng)
    pred2 = dict(pred)
    pred2["mano.j3d.cam.r"] = pred["mano.j3d.cam.r"] + jnp.asarray([0.002, 0, 0])
    pred2["mano.j3d.cam.r"] = pred2["mano.j3d.cam.r"].at[:, 1:].add(0.003)
    out = M.measure_error(pred2, targets)
    v = np.asarray(out["mpjpe/ra/h"])
    assert np.nanmin(v) > 0.1  # mm

def test_invalid_frames_are_nan(rng):
    pred, targets = build(rng)
    targets = dict(targets)
    targets["is_valid"] = jnp.asarray([1.0, 0.0, 1.0])
    out = M.measure_error(pred, targets)
    assert np.isnan(np.asarray(out["aae"])[1])
    assert np.isnan(np.asarray(out["success_rate/0.05"])[1])


def test_acc_pose_shape(rng):
    pred, targets = build(rng)
    out = M.eval_acc_pose(pred, targets)
    assert out["acc/h"].shape == (B,)
    assert np.isnan(np.asarray(out["acc/h"])[0])  # padded ends
    # perfect predictions: middle entries 0 or nan depending on window
