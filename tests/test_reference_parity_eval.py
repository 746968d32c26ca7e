"""Eval-pipeline numerical parity vs the REFERENCE metric code.

VERDICT r3 missing #3: the metric registry
(`/root/reference/arctic_tools/src/utils/eval_modules.py:454-464`) and
`prepare_data`/`measure_error` (`/root/reference/arctic_tools/process.py:
249-310`) run here on CPU — the real modules — on the SAME inputs as
`uvhand_tpu/evaluation/metrics.py`, per-frame, NaN-aware.

Two levels:
  1. metric-function A/B on synthetic padded tensors with mixed validity,
     contacts and variable per-object vertex counts;
  2. END-TO-END: a real UVHandDETR forward on a synthetic-ARCTIC-root batch,
     decoded by `evaluation/decode.py`, measured by the jitted
     `engine.make_eval_step` — against the reference's own
     `prepare_data(pred=...)` + `measure_error` on the identical decoded
     predictions and targets. Proves CDev/MPJPE/MRRPE/AAE/success-rate ARE
     the reference's numbers, not lookalikes.
"""

import sys
import os
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from reference_stubs import import_reference_loss, torch_cuda_as_cpu  # noqa: E402

IMG_RES = 224.0
B = 5


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


def _make_metric_data(rng):
    """Padded pred/targets with mixed validity, contacts, variable v_len."""
    V, J = 40, 21
    v_len = np.array([40, 28, 33, 40, 25])
    parts = np.zeros((B, V), np.int64)
    for i, n in enumerate(v_len):
        parts[i, :n] = rng.integers(1, 3, n)  # 1=top, 2=bottom
        parts[i, 0] = 2  # ensure a bottom root exists
    data = {
        "is_valid": np.array([1, 1, 0, 1, 1], np.float32),
        "left_valid": np.array([1, 0, 1, 1, 1], np.float32),
        "right_valid": np.array([1, 1, 1, 0, 1], np.float32),
        "object.radian": rng.normal(size=B).astype(np.float32),
        "object.v_len": v_len,
        "object.parts_ids": parts,
        "object.diameter": np.abs(rng.normal(0.2, 0.05, B)).astype(np.float32),
        "dist.ro": rng.uniform(0, 6e-3, (B, 778)).astype(np.float32),
        "dist.lo": rng.uniform(0, 6e-3, (B, 778)).astype(np.float32),
        "idx.ro": rng.integers(0, V, (B, 778)),
        "idx.lo": rng.integers(0, V, (B, 778)),
    }
    for who in ("gt", "pr"):
        data[f"{who}.j3d.r"] = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.1
        data[f"{who}.j3d.l"] = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.1
        data[f"{who}.v3d.r"] = rng.normal(size=(B, 778, 3)).astype(np.float32) * 0.1
        data[f"{who}.v3d.l"] = rng.normal(size=(B, 778, 3)).astype(np.float32) * 0.1
        data[f"{who}.v.o"] = rng.normal(size=(B, V, 3)).astype(np.float32) * 0.1
        data[f"{who}.radian"] = rng.normal(size=B).astype(np.float32)
    return data


def _my_dicts(d):
    import jax.numpy as jnp

    tg = {
        "is_valid": jnp.asarray(d["is_valid"]),
        "left_valid": jnp.asarray(d["left_valid"]),
        "right_valid": jnp.asarray(d["right_valid"]),
        "object.radian": jnp.asarray(d["gt.radian"]),
        "object.v_len": jnp.asarray(d["object.v_len"]),
        "object.parts_ids": jnp.asarray(d["object.parts_ids"]),
        "object.diameter": jnp.asarray(d["object.diameter"]),
        "object.v.cam": jnp.asarray(d["gt.v.o"]),
        "mano.j3d.cam.r": jnp.asarray(d["gt.j3d.r"]),
        "mano.j3d.cam.l": jnp.asarray(d["gt.j3d.l"]),
        "dist.ro": jnp.asarray(d["dist.ro"]),
        "dist.lo": jnp.asarray(d["dist.lo"]),
        "idx.ro": jnp.asarray(d["idx.ro"], jnp.int32),
        "idx.lo": jnp.asarray(d["idx.lo"], jnp.int32),
    }
    pr = {
        "object.radian": jnp.asarray(d["pr.radian"]),
        "object.v.cam": jnp.asarray(d["pr.v.o"]),
        "mano.j3d.cam.r": jnp.asarray(d["pr.j3d.r"]),
        "mano.j3d.cam.l": jnp.asarray(d["pr.j3d.l"]),
        "mano.v3d.cam.r": jnp.asarray(d["pr.v3d.r"]),
        "mano.v3d.cam.l": jnp.asarray(d["pr.v3d.l"]),
    }
    return pr, tg


def _ref_dicts(d):
    tg = {
        "is_valid": _t(d["is_valid"]),
        "left_valid": _t(d["left_valid"]),
        "right_valid": _t(d["right_valid"]),
        "object.radian": _t(d["gt.radian"]),
        "object.v_len": torch.from_numpy(d["object.v_len"]).long(),
        "object.v.cam": _t(d["gt.v.o"]),
        "mano.j3d.cam.r": _t(d["gt.j3d.r"]),
        "mano.j3d.cam.l": _t(d["gt.j3d.l"]),
        "dist.ro": _t(d["dist.ro"]),
        "dist.lo": _t(d["dist.lo"]),
        "idx.ro": torch.from_numpy(d["idx.ro"]).long(),
        "idx.lo": torch.from_numpy(d["idx.lo"]).long(),
    }
    pr = {
        "object.radian": _t(d["pr.radian"]),
        "object.v.cam": _t(d["pr.v.o"]),
        "mano.j3d.cam.r": _t(d["pr.j3d.r"]),
        "mano.j3d.cam.l": _t(d["pr.j3d.l"]),
        "mano.v3d.cam.r": _t(d["pr.v3d.r"]),
        "mano.v3d.cam.l": _t(d["pr.v3d.l"]),
    }
    meta = {
        "part_ids": torch.from_numpy(d["object.parts_ids"]).long(),
        "diameter": _t(d["object.diameter"]),
    }
    return pr, tg, meta


METRIC_KEYS = {
    "aae": ["aae"],
    "mpjpe.ra": ["mpjpe/ra/h"],
    "mrrpe": ["mrrpe/r/l", "mrrpe/r/o"],
    "success_rate": ["success_rate/0.05"],
    "cdev": ["cdev/ho"],
}


def _cmp_metric(name, ours, refv, atol=1e-3, rtol=1e-5):
    # atol 1e-3 (mm-scale metrics) plus 1e-5 relative: mm values of O(500)
    # carry ~1e-3 of pure fp32 reduction noise
    o = np.asarray(ours, np.float64).reshape(-1)
    r = np.asarray(torch.as_tensor(refv).detach().numpy()
                   if isinstance(refv, torch.Tensor) else refv,
                   np.float64).reshape(-1)
    assert o.shape == r.shape, (name, o.shape, r.shape)
    assert (np.isnan(o) == np.isnan(r)).all(), (
        f"{name}: NaN pattern differs: ours {np.isnan(o)}, ref {np.isnan(r)}")
    m = ~np.isnan(o)
    err = (np.abs(o[m] - r[m]) - rtol * np.abs(r[m])).max() if m.any() else 0.0
    assert err < atol, f"{name}: max err {err:.2e} (ours {o[m]}, ref {r[m]})"


def test_metric_functions_parity():
    from uvhand_tpu.evaluation import metrics as mymetrics

    ref = import_reference_loss()
    rng = np.random.default_rng(17)
    d = _make_metric_data(rng)
    pr_j, tg_j = _my_dicts(d)
    pr_t, tg_t, meta_t = _ref_dicts(d)

    with torch.no_grad(), torch_cuda_as_cpu():
        for m in METRIC_KEYS:
            ref_out = ref.eval_modules.eval_fn_dict[m](pr_t, tg_t, meta_t)
            my_out = mymetrics.eval_fn_dict[m](pr_j, tg_j)
            for k in METRIC_KEYS[m]:
                _cmp_metric(k, my_out[k], ref_out[k])


def test_mdev_parity():
    """eval_motion_deviation (sequence-level stable-contact windows) vs the
    reference `src/utils/mdev.py` on a crafted 60-frame sequence: runs
    shorter than window_thres, exactly at it, longer (exercising the
    reference's triu(window_thres) masking quirk on >15-frame windows),
    sliding-finger rejection, and invalid frames inside a window.

    Contact runs never touch frame 0 / F-1: the reference's window scan
    silently drops runs reaching the last frame and wraps a python -1 index
    on frame-0 runs — border behavior is unspecified, so the A/B stays on
    the defined interior."""
    from uvhand_tpu.evaluation import mdev as mymdev

    ref = import_reference_loss()
    rng = np.random.default_rng(3)
    F, V, NV = 60, 778, 50

    dist = np.ones((F, V), np.float32)  # no contact by default
    # vert 10: 20-frame contact run (longer than window_thres=15)
    dist[5:25, 10] = 1e-3
    # vert 20: exactly 15 frames
    dist[30:45, 20] = 1e-3
    # vert 30: 10 frames (too short -> dropped)
    dist[40:50, 30] = 1e-3
    # vert 40: 16 frames but slides across the object (far-apart verts)
    dist[10:26, 40] = 1e-3
    idx = rng.integers(0, 3, (F, V))  # nearby object verts (no slide)
    idx[10:26, 40] = np.arange(16) % NV  # vert 40 slides
    dist_lo = np.ones((F, V), np.float32)
    dist_lo[20:40, 5] = 1e-3
    idx_lo = rng.integers(0, 3, (F, V))

    vo = np.zeros((F, NV, 3), np.float32)
    vo[:] = rng.normal(size=(NV, 3)).astype(np.float32) * 0.5  # static
    vo[:, :3] += 100.0  # verts 0-2 clustered far away but NEAR each other?
    vo[:, 0] = vo[:, 1] + 1e-4  # ensure verts 0..2 are within 3mm
    vo[:, 2] = vo[:, 1] - 1e-4

    rv = np.ones(F, np.float32)
    rv[18] = 0.0  # an invalid frame inside vert-10's window
    lv = np.ones(F, np.float32)
    iv = np.ones(F, np.float32)

    vh_r = rng.normal(size=(F, V, 3)).astype(np.float32) * 0.01
    vh_l = rng.normal(size=(F, V, 3)).astype(np.float32) * 0.01
    v_o = vo + rng.normal(size=(F, NV, 3)).astype(np.float32) * 0.005

    tg_t = {"is_valid": _t(iv), "right_valid": _t(rv), "left_valid": _t(lv),
            "dist.ro": _t(dist), "idx.ro": torch.from_numpy(idx).long(),
            "dist.lo": _t(dist_lo), "idx.lo": torch.from_numpy(idx_lo).long(),
            "object.v.cam": _t(vo)}
    pr_t = {"mano.v3d.cam.r": _t(vh_r), "mano.v3d.cam.l": _t(vh_l),
            "object.v.cam": _t(v_o)}
    with torch.no_grad(), torch_cuda_as_cpu():
        ref_out = ref.eval_modules.eval_motion_deviation(pr_t, tg_t, {})

    tg = {"is_valid": iv, "right_valid": rv, "left_valid": lv,
          "dist.ro": dist, "idx.ro": idx, "dist.lo": dist_lo,
          "idx.lo": idx_lo, "object.v.cam": vo}
    pr = {"mano.v3d.cam.r": vh_r, "mano.v3d.cam.l": vh_l, "object.v.cam": v_o}
    mine = mymdev.eval_motion_deviation(pr, tg)

    r = np.sort(np.asarray(ref_out["mdev/h"]).reshape(-1))
    o = np.sort(np.asarray(mine["mdev/h"]).reshape(-1))
    assert o.shape == r.shape, (o.shape, r.shape)
    np.testing.assert_allclose(o, r, atol=1e-4)
    assert len(o) >= 2  # the crafted windows actually exist


def test_acc_pose_parity():
    """ACC (m/s^2, BASELINE table metric) vs the reference eval_acc_pose
    (eval_modules.py:283-371) on a 20-frame sequence with validity gaps.
    Note the reference's own shape quirk: acc/h is NaN-padded to F frames,
    acc/o stays at F-2 — compare accordingly."""
    from uvhand_tpu.evaluation import metrics as mymetrics

    ref = import_reference_loss()
    rng = np.random.default_rng(23)
    F, V, NV, J = 20, 80, 30, 21
    parts = np.zeros((F, NV), np.int64)
    parts[:, :24] = rng.integers(1, 3, 24)
    parts[:, 0] = 2

    def seq(scale):
        return (rng.normal(size=(F, V, 3)) * scale).astype(np.float32)

    d = {
        "gt_vo": rng.normal(size=(F, NV, 3)).astype(np.float32) * 0.1,
        "pr_vo": rng.normal(size=(F, NV, 3)).astype(np.float32) * 0.1,
        "gt_vr": seq(0.1), "pr_vr": seq(0.1),
        "gt_vl": seq(0.1), "pr_vl": seq(0.1),
        "gt_jr": rng.normal(size=(F, J, 3)).astype(np.float32) * 0.1,
        "pr_jr": rng.normal(size=(F, J, 3)).astype(np.float32) * 0.1,
        "gt_jl": rng.normal(size=(F, J, 3)).astype(np.float32) * 0.1,
        "pr_jl": rng.normal(size=(F, J, 3)).astype(np.float32) * 0.1,
    }
    iv = np.ones(F, np.float32); iv[9] = 0
    rv = np.ones(F, np.float32); rv[3] = 0
    lv = np.ones(F, np.float32); lv[14:16] = 0

    tg_t = {"object.v.cam": _t(d["gt_vo"]), "mano.v3d.cam.r": _t(d["gt_vr"]),
            "mano.v3d.cam.l": _t(d["gt_vl"]), "mano.j3d.cam.r": _t(d["gt_jr"]),
            "mano.j3d.cam.l": _t(d["gt_jl"]),
            "object.parts_ids": torch.from_numpy(parts).long(),
            "is_valid": _t(iv), "right_valid": _t(rv), "left_valid": _t(lv)}
    pr_t = {"object.v.cam": _t(d["pr_vo"]), "mano.v3d.cam.r": _t(d["pr_vr"]),
            "mano.v3d.cam.l": _t(d["pr_vl"]), "mano.j3d.cam.r": _t(d["pr_jr"]),
            "mano.j3d.cam.l": _t(d["pr_jl"])}
    with torch.no_grad(), torch_cuda_as_cpu():
        ref_out = ref.eval_modules.eval_acc_pose(pr_t, tg_t, {})

    import jax.numpy as jnp

    tg = {k: jnp.asarray(v.numpy() if isinstance(v, torch.Tensor) else v)
          for k, v in tg_t.items()}
    pr = {k: jnp.asarray(v.numpy()) for k, v in pr_t.items()}
    mine = mymetrics.eval_acc_pose(pr, tg)

    _cmp_metric("acc/h", mine["acc/h"], ref_out["acc/h"], atol=1e-2, rtol=1e-4)
    # reference acc/o is unpadded (F-2); ours pads to F like acc/h
    _cmp_metric("acc/o", np.asarray(mine["acc/o"])[1:-1], ref_out["acc/o"],
                atol=1e-2, rtol=1e-4)


@pytest.mark.slow
def test_eval_pipeline_end_to_end():
    """engine.make_eval_step (jitted fwd + decode + metrics) vs the
    reference prepare_data+measure_error on the identical decoded
    predictions/targets from the same synthetic frames."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.data.process import process_targets
    from uvhand_tpu.evaluation.decode import decode_predictions
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.losses.criterion import select_queries
    from uvhand_tpu.models.detr import UVHandDETR

    ref = import_reference_loss()
    xdict = ref.process.xdict

    root = tempfile.mkdtemp(prefix="uvhand_evalab_")
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    arctic.make_synthetic_root(root, num_seqs=1, frames=4, views=1,
                               obj_bank=bank)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    batch = next(iter(loader.DataLoader(ds, 4, shuffle=False, seed=0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
        d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0,
    )
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["images"][:1])["params"]

    # MY eval program (one jitted step)
    step = engine.make_eval_step(model, mano_r, mano_l, bank)
    mine = step(params, batch)

    # identical decode, un-jitted, for the reference metric stack
    targets = process_targets(batch, mano_r, mano_l, bank, IMG_RES)
    outputs = model.apply({"params": params}, batch["images"], train=False)
    last = {k: v[-1] for k, v in outputs["stacked"].items() if v is not None}
    pred = decode_predictions(select_queries(last), targets, mano_r, mano_l, bank)

    # -> reference torch xdicts
    pred_t = xdict()
    for k, v in pred.items():
        arr = np.asarray(v)
        if k.startswith("mano.pose."):
            # prepare_data expects rotation matrices here
            aa = torch.from_numpy(arr.reshape(-1, 3)).float()
            pred_t[k] = ref.rot.quaternion_to_matrix(
                ref.rot.axis_angle_to_quaternion(aa)).reshape(-1, 16, 3, 3)
        elif arr.dtype.kind in "iub":
            pred_t[k] = torch.from_numpy(np.asarray(arr)).long()
        else:
            pred_t[k] = _t(arr)
    tg_t = xdict()
    for k, v in targets.items():
        arr = np.asarray(v)
        tg_t[k] = (torch.from_numpy(arr).long() if arr.dtype.kind in "iub"
                   else _t(arr))
    nk = np.asarray(targets["object.kp2d.norm"]).shape[1] // 2
    if "object.kp2d.norm.t" not in tg_t:
        tg_t["object.kp2d.norm.t"] = _t(targets["object.kp2d.norm"][:, :nk])
        tg_t["object.kp2d.norm.b"] = _t(targets["object.kp2d.norm"][:, nk:])
    meta_t = xdict({
        "part_ids": torch.from_numpy(np.asarray(targets["object.parts_ids"])).long(),
        "diameter": _t(targets["object.diameter"]),
        "intrinsics": _t(targets["intrinsics"]),
        "query_names": torch.from_numpy(np.asarray(targets["query_idx"])).long(),
    })
    args = types.SimpleNamespace(img_res=IMG_RES, device="cpu")

    with torch.no_grad(), torch_cuda_as_cpu():
        data = ref.process.prepare_data(
            args, None, tg_t, meta_t, cfg=None, pred=pred_t)
        ref_metrics = ref.process.measure_error(
            data, ["aae", "mpjpe.ra", "mrrpe", "success_rate", "cdev"])

    for keys in METRIC_KEYS.values():
        for k in keys:
            _cmp_metric(k, mine[k], ref_metrics[k])
