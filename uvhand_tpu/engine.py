"""Train / eval epoch loops.

Parity with `/root/reference/engine.py` (`train_pose:537`, `test_pose:700`):
  - train: GT preprocessing + forward + criterion + optimizer fused into ONE
    jitted step (the reference runs GT FK, matching and six aux losses as
    separate device/host phases per step),
  - NaN-loss guard aborts training (engine.py:626-630),
  - eval: forward -> query select -> decode -> per-frame metrics, all on
    device; NaN frames dropped in the host-side aggregation
    (engine.py:784-791).

Distribution: params replicated, batch sharded over the mesh's data axis —
XLA inserts the DDP-equivalent gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.loader import device_prefetch
from .data.process import process_targets
from .evaluation.decode import decode_predictions
from .evaluation.metrics import measure_error
from .losses.criterion import arctic_criterion, select_queries
from .utils.logging import MetricLogger


def select_output_frames(outputs, idx):
    """Gather batch rows `idx` from a model output pytree. Used by temporal
    center-frame training (`split_window=False`, tempo_dataset.py:97-103):
    the model runs on all B*T window frames, the criterion on the B center
    frames only."""
    out = dict(outputs)
    out["stacked"] = {
        k: (v[:, idx] if v is not None else None)
        for k, v in outputs["stacked"].items()
    }
    if outputs.get("interm_outputs") is not None:
        out["interm_outputs"] = {
            k: (v[idx] if v is not None else None)
            for k, v in outputs["interm_outputs"].items()
        }
    return out


def make_fused_train_step(model, mano_r, mano_l, obj_bank, img_res=224.0,
                          weights=None, two_stage=True):
    """Raw batch -> GT preprocess -> fwd -> criterion -> update, one program."""

    def loss_fn(params, batch, rng):
        batch = dict(batch)
        center_index = batch.pop("center_index", None)
        targets = process_targets(batch, mano_r, mano_l, obj_bank, img_res)
        targets = jax.lax.stop_gradient(targets)
        outputs = model.apply(
            {"params": params}, batch["images"], train=True,
            rngs={"dropout": rng, "feature_mask": jax.random.fold_in(rng, 1)},
        )
        if center_index is not None:
            outputs = select_output_frames(outputs, center_index)
        return arctic_criterion(
            outputs, targets, mano_r, mano_l, obj_bank,
            img_res=img_res, weights=weights, two_stage=two_stage,
        )

    # NOTE: no donation — flax TrainState + multi_transform opt state contains
    # aliased leaves on this jax version; donation deletes them once and the
    # second reference trips "Array has been deleted".
    @jax.jit
    def step(state, batch, rng):
        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, ld

    return step


def make_eval_step(model, mano_r, mano_l, obj_bank, img_res=224.0):
    """Forward + decode + per-frame metrics in one jitted program."""

    @jax.jit
    def step(params, batch):
        targets = process_targets(batch, mano_r, mano_l, obj_bank, img_res)
        outputs = model.apply({"params": params}, batch["images"], train=False)
        st = outputs["stacked"]
        last = {k: v[-1] for k, v in st.items()}
        selected = select_queries(last)
        pred = decode_predictions(selected, targets, mano_r, mano_l, obj_bank, img_res)
        metrics = measure_error(pred, targets)
        return metrics

    return step


def train_one_epoch(state, step_fn, loader, epoch: int, rng,
                    sharding=None, print_freq: int = 50,
                    max_steps: Optional[int] = None):
    logger = MetricLogger()
    loader.set_epoch(epoch)
    it = device_prefetch(loader, sharding=sharding)
    for i, batch in enumerate(logger.log_every(it, print_freq, f"Epoch [{epoch}]", total=len(loader))):
        batch = {k: v for k, v in batch.items()}
        state, ld = step_fn(state, batch, jax.random.fold_in(rng, i))
        total = float(ld["total"])
        if not np.isfinite(total):
            raise FloatingPointError(f"Loss is {total}, stopping training (step {i})")
        logger.update(loss=total, grad_norm=float(ld.get("grad_norm", 0.0)))
        if max_steps is not None and i + 1 >= max_steps:
            break
    return state, {k: m.global_avg for k, m in logger.meters.items()}


def make_sequence_eval_step(model, mano_r, mano_l, obj_bank, img_res=224.0):
    """Forward + decode returning camera-space pred/target tensors so the
    host can assemble whole sequences for acc/mdev (measure_error skips them
    in the per-batch loop — arctic_tools/process.py:308-310)."""

    @jax.jit
    def step(params, batch):
        targets = process_targets(batch, mano_r, mano_l, obj_bank, img_res)
        outputs = model.apply({"params": params}, batch["images"], train=False)
        st = outputs["stacked"]
        selected = select_queries({k: v[-1] for k, v in st.items()})
        pred = decode_predictions(selected, targets, mano_r, mano_l, obj_bank, img_res)
        keep_pred = {k: pred[k] for k in (
            "mano.v3d.cam.r", "mano.v3d.cam.l", "mano.j3d.cam.r", "mano.j3d.cam.l",
            "object.v.cam", "object.radian",
        )}
        keep_tgt = {k: targets[k] for k in (
            "mano.v3d.cam.r", "mano.v3d.cam.l", "mano.j3d.cam.r", "mano.j3d.cam.l",
            "object.v.cam", "object.parts_ids", "object.radian",
            "is_valid", "left_valid", "right_valid", "dist.ro", "dist.lo",
            "idx.ro", "idx.lo",
        )}
        return keep_pred, keep_tgt

    return step


def evaluate_sequences(params, seq_step, dataset, batch_size: int = 16,
                       max_frames: Optional[int] = None) -> Dict[str, float]:
    """Whole-sequence metrics: ACC (m/s^2) and MDev (mm) over time-ordered
    frames per (subject, seq, view)."""
    from .data.arctic import collate
    from .evaluation.mdev import eval_motion_deviation
    from .evaluation.metrics import eval_acc_pose

    groups: Dict[str, list] = {}
    for i, n in enumerate(dataset.imgnames):
        sid, seq, view, _ = n.split("/")[-4:]
        groups.setdefault(f"{sid}/{seq}/{view}", []).append(i)

    accs, mdevs = {"acc/h": [], "acc/o": []}, []
    for key, ids in groups.items():
        ids = sorted(ids, key=lambda i: dataset.imgnames[i])
        if max_frames:
            ids = ids[:max_frames]
        preds, tgts = [], []
        for s in range(0, len(ids), batch_size):
            chunk = ids[s : s + batch_size]
            pad = batch_size - len(chunk)
            samples = [dataset[i] for i in chunk + [chunk[-1]] * pad]
            batch = {k: jnp.asarray(v) for k, v in collate(samples).items()}
            p, t = seq_step(params, batch)
            trim = len(chunk)
            preds.append({k: np.asarray(v)[:trim] for k, v in p.items()})
            tgts.append({k: np.asarray(v)[:trim] for k, v in t.items()})
        pred = {k: np.concatenate([b[k] for b in preds]) for k in preds[0]}
        tgt = {k: np.concatenate([b[k] for b in tgts]) for k in tgts[0]}
        acc = eval_acc_pose(
            {k: jnp.asarray(v) for k, v in pred.items()},
            {k: jnp.asarray(v) for k, v in tgt.items()},
        )
        for k in accs:
            accs[k].append(np.asarray(acc[k]))
        md = eval_motion_deviation(pred, tgt)
        if len(md["mdev/h"]):
            mdevs.append(md["mdev/h"])

    out = {k: float(np.nanmean(np.concatenate(v))) for k, v in accs.items() if v}
    out["mdev/h"] = float(np.nanmean(np.concatenate(mdevs))) if mdevs else float("nan")
    return out


def evaluate(params, eval_step, loader, sharding=None,
             max_steps: Optional[int] = None) -> Dict[str, float]:
    per_metric = {}
    it = device_prefetch(loader, sharding=sharding)
    for i, batch in enumerate(it):
        metrics = eval_step(params, batch)
        for k, v in metrics.items():
            per_metric.setdefault(k, []).append(np.asarray(v))
        if max_steps is not None and i + 1 >= max_steps:
            break
    return {
        k: float(np.nanmean(np.concatenate(v))) for k, v in per_metric.items()
    }
