"""ARCTIC evaluation metrics.

Parity with `/root/reference/arctic_tools/src/utils/eval_modules.py`
(registry `eval_fn_dict:454-464`) and `common/metrics.py`. Per-frame values
are returned with NaN marking invalid frames, exactly like the reference;
aggregation is nanmean over frames.

TPU-first: metrics are pure jnp on padded tensors with masks (the reference
unpads to Python lists per sample); they run on device inside an eval step or
on host via numpy inputs — both work since only jnp ops are used.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

NAN = jnp.nan


def nanmean(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.nanmean(x, axis=axis)


def compute_joint3d_error(gt, pred, valid) -> jnp.ndarray:
    """(B, J, 3) -> (B, J) distances; invalid rows = NaN (metrics.py:22-30)."""
    dist = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=2))
    return jnp.where(valid[:, None] > 0, dist, NAN)


def compute_mrrpe(root_a_gt, root_b_gt, root_a_pred, root_b_pred, valid):
    rel_gt = root_b_gt - root_a_gt
    rel_pred = root_b_pred - root_a_pred
    err = jnp.sqrt(jnp.sum((rel_pred - rel_gt) ** 2, axis=1))
    return jnp.where(valid > 0, err, NAN)


def compute_arti_deg_error(pred_radian, gt_radian):
    return jnp.abs(pred_radian - gt_radian) / math.pi * 180.0


def object_bottom_root(v_cam, parts_ids):
    """Mean of bottom-part (parts_ids==2) vertices. (B, V, 3), (B, V) -> (B, 3)."""
    m = (parts_ids == 2).astype(v_cam.dtype)
    return jnp.sum(v_cam * m[..., None], 1) / jnp.maximum(jnp.sum(m, 1), 1)[:, None]


def eval_degree(pred, targets) -> Dict[str, jnp.ndarray]:
    err = compute_arti_deg_error(
        pred["object.radian"].reshape(-1), targets["object.radian"].reshape(-1)
    )
    return {"aae": jnp.where(targets["is_valid"] > 0, err, NAN)}


def eval_mpjpe_ra(pred, targets) -> Dict[str, jnp.ndarray]:
    is_valid = targets["is_valid"]
    lv = targets["left_valid"] * is_valid
    rv = targets["right_valid"] * is_valid

    def ra(x):
        return x - x[:, :1]

    r = compute_joint3d_error(
        ra(targets["mano.j3d.cam.r"]), ra(pred["mano.j3d.cam.r"]), rv
    ).mean(axis=1)
    l = compute_joint3d_error(
        ra(targets["mano.j3d.cam.l"]), ra(pred["mano.j3d.cam.l"]), lv
    ).mean(axis=1)
    h = nanmean(jnp.stack([r, l], 1), axis=1)
    return {"mpjpe/ra/h": h * 1000.0}


def eval_mrrpe(pred, targets) -> Dict[str, jnp.ndarray]:
    is_valid = targets["is_valid"]
    lv = targets["left_valid"] * is_valid
    rv = targets["right_valid"] * is_valid
    parts = targets["object.parts_ids"]

    root_o_gt = object_bottom_root(targets["object.v.cam"], parts)
    root_o_pred = object_bottom_root(pred["object.v.cam"], parts)
    rl = compute_mrrpe(
        targets["mano.j3d.cam.r"][:, 0], targets["mano.j3d.cam.l"][:, 0],
        pred["mano.j3d.cam.r"][:, 0], pred["mano.j3d.cam.l"][:, 0], lv * rv,
    )
    ro = compute_mrrpe(
        targets["mano.j3d.cam.r"][:, 0], root_o_gt,
        pred["mano.j3d.cam.r"][:, 0], root_o_pred, rv * is_valid,
    )
    return {"mrrpe/r/l": rl * 1000.0, "mrrpe/r/o": ro * 1000.0}


def eval_v2v_success(pred, targets, alpha: float = 0.05) -> Dict[str, jnp.ndarray]:
    parts = targets["object.parts_ids"]
    vmask = (parts > 0).astype(jnp.float32)
    root_gt = object_bottom_root(targets["object.v.cam"], parts)
    root_pred = object_bottom_root(pred["object.v.cam"], parts)
    d = jnp.sqrt(
        jnp.sum(
            (
                (targets["object.v.cam"] - root_gt[:, None])
                - (pred["object.v.cam"] - root_pred[:, None])
            )
            ** 2,
            axis=2,
        )
    )
    thresh = targets["object.diameter"][:, None] * alpha
    ok = (d < thresh).astype(jnp.float32) * vmask
    rate = jnp.sum(ok, 1) / jnp.maximum(jnp.sum(vmask, 1), 1)
    rate = jnp.where(targets["is_valid"] > 0, rate, NAN)
    return {f"success_rate/{alpha:.2f}": rate * 100.0}


def contact_deviation_metric(v_obj, v_hand, dist, idx, is_valid, hand_valid):
    """loss_modules.py contact_deviation: per-frame mean contact displacement,
    NaN when no contacts / invalid."""
    valid = hand_valid * is_valid
    corres = jnp.take_along_axis(v_obj, idx[:, :, None], axis=1)
    disp = jnp.sqrt(jnp.sum((corres - v_hand) ** 2, -1))
    contact = (dist <= 3e-3).astype(jnp.float32) * valid[:, None]
    n = jnp.sum(contact, 1)
    per = jnp.sum(disp * contact, 1) / jnp.maximum(n, 1)
    return jnp.where(n > 0, per, NAN)


def eval_contact_deviation(pred, targets) -> Dict[str, jnp.ndarray]:
    ro = contact_deviation_metric(
        pred["object.v.cam"], pred["mano.v3d.cam.r"],
        targets["dist.ro"], targets["idx.ro"],
        targets["is_valid"], targets["right_valid"],
    )
    lo = contact_deviation_metric(
        pred["object.v.cam"], pred["mano.v3d.cam.l"],
        targets["dist.lo"], targets["idx.lo"],
        targets["is_valid"], targets["left_valid"],
    )
    ho = nanmean(jnp.stack([ro, lo], 1), axis=1)
    return {"cdev/ho": ho * 1000.0}


def compute_error_accel(gt, pred, fps: float = 30.0):
    """[1,-2,1]/h^2 stencil accel error per frame (eval_modules.py:254-280)."""
    h = 1.0 / fps
    a_gt = (gt[:-2] - 2 * gt[1:-1] + gt[2:]) / h**2
    a_pred = (pred[:-2] - 2 * pred[1:-1] + pred[2:]) / h**2
    return jnp.mean(jnp.linalg.norm(a_pred - a_gt, axis=2), axis=1)


def _acc_valid(valid):
    v = valid > 0
    return v[:-2] & v[1:-1] & v[2:]


def eval_acc_pose(pred, targets, fps: float = 30.0) -> Dict[str, jnp.ndarray]:
    """Sequence-level: inputs ordered by time (eval_modules.py:283-...)."""
    is_valid = targets["is_valid"]
    lv = targets["left_valid"] * is_valid
    rv = targets["right_valid"] * is_valid
    parts = targets["object.parts_ids"]

    root_o_gt = object_bottom_root(targets["object.v.cam"], parts)[:, None]
    root_o_pred = object_bottom_root(pred["object.v.cam"], parts)[:, None]

    acc_r = compute_error_accel(
        targets["mano.v3d.cam.r"] - targets["mano.j3d.cam.r"][:, :1],
        pred["mano.v3d.cam.r"] - pred["mano.j3d.cam.r"][:, :1], fps,
    )
    acc_l = compute_error_accel(
        targets["mano.v3d.cam.l"] - targets["mano.j3d.cam.l"][:, :1],
        pred["mano.v3d.cam.l"] - pred["mano.j3d.cam.l"][:, :1], fps,
    )
    acc_o = compute_error_accel(
        targets["object.v.cam"] - root_o_gt, pred["object.v.cam"] - root_o_pred, fps
    )
    acc_r = jnp.where(_acc_valid(rv), acc_r, NAN)
    acc_l = jnp.where(_acc_valid(lv), acc_l, NAN)
    acc_o = jnp.where(_acc_valid(is_valid), acc_o, NAN)
    acc_h = nanmean(jnp.stack([acc_r, acc_l], 1), axis=1)

    pad = jnp.full((1,), NAN)
    return {
        "acc/h": jnp.concatenate([pad, acc_h, pad]),
        "acc/o": jnp.concatenate([pad, acc_o, pad]),
    }


# per-batch metrics (sequence metrics mdev / acc handled separately, like
# measure_error skipping them in the per-batch loop, process.py:308-310)
eval_fn_dict = {
    "aae": eval_degree,
    "mpjpe.ra": eval_mpjpe_ra,
    "mrrpe": eval_mrrpe,
    "success_rate": eval_v2v_success,
    "cdev": eval_contact_deviation,
}


def measure_error(pred, targets, metrics=("aae", "mpjpe.ra", "mrrpe", "success_rate", "cdev")):
    out: Dict[str, jnp.ndarray] = {}
    for m in metrics:
        out.update(eval_fn_dict[m](pred, targets))
    return out
