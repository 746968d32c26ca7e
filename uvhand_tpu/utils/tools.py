"""Misc training/eval tools.

Parity with `/root/reference/util/tools.py` live parts:
  - `arctic_smoothing:22-34` — iterative neighbor averaging over a window
    (vectorized here; the reference triple-loops in Python),
  - `create_loss_dict:37-124` — loss-group display aggregation,
  - `create_arctic_score_dict:127-135`,
  - `extract_epoch:654`.
"""

from __future__ import annotations

import re
from typing import Dict

import jax.numpy as jnp
import numpy as np


def arctic_smoothing(target, count: int):
    """(B, T, C) -> iterative pairwise smoothing along T, flattened (B*T, C).

    Matches the reference recursion: for i in 0..T-2:
    x[i+1] = x[i] = (x[i] + x[i+1]) / 2, applied sequentially `count` times.
    """
    x = jnp.asarray(target)
    B, T, C = x.shape

    def one_pass(x):
        # sequential along T (dependency chain) — scan it
        def body(prev, xi):
            new = (prev + xi) / 2.0
            return new, new

        first = x[:, 0]
        _, rest = _scan_time(body, first, x[:, 1:])
        # final sequence is [a1, ..., a_{T-1}, a_{T-1}]: each step writes the
        # running average into both slots, so the last value repeats
        return jnp.concatenate([rest, rest[:, -1:]], axis=1)[:, :T]

    for _ in range(count):
        x = one_pass(x)
    return x.reshape(-1, C)


def _scan_time(body, init, seq_bt):
    import jax

    seq_tb = jnp.swapaxes(seq_bt, 0, 1)
    carry, out = jax.lax.scan(body, init, seq_tb)
    return carry, jnp.swapaxes(out, 0, 1)


LOSS_GROUPS = {
    "loss_obj_smt": ["loss/object/v3d_smoothing"],
    "loss_ce": ["loss_ce"],
    "loss_CDev": ["loss/cd"],
    "loss_smooth": ["loss/smooth/2d", "loss/smooth/3d"],
    "loss_penetr": ["loss/penetr"],
    "loss_mano": ["loss/mano/pose/r", "loss/mano/beta/r", "loss/mano/pose/l", "loss/mano/beta/l"],
    "loss_rot": ["loss/object/radian", "loss/object/rot"],
    "loss_transl": ["loss/mano/transl/l", "loss/object/transl"],
    "loss_kp": [
        "loss/mano/kp2d/r", "loss/mano/kp3d/r", "loss/mano/kp2d/l", "loss/mano/kp3d/l",
        "loss/object/kp2d", "loss/object/kp3d",
    ],
    "loss_cam": ["loss/mano/cam_t/r", "loss/mano/cam_t/l", "loss/object/cam_t"],
    "loss_hand_key": ["loss_hand_keypoint"],
    "loss_obj_key": ["loss_obj_keypoint"],
    "loss_acc_h": ["acc/h"],
    "loss_acc_o": ["acc/o"],
}

MODE_ITEMS = {
    "baseline": ["loss_ce", "loss_CDev", "loss_obj_smt", "loss_mano", "loss_rot",
                 "loss_transl", "loss_kp", "loss_cam", "loss_hand_key", "loss_obj_key"],
    "dino": ["loss_ce", "loss_CDev", "loss_penetr", "loss_mano", "loss_rot",
             "loss_transl", "loss_kp", "loss_cam", "loss_hand_key", "loss_obj_key"],
    "smoothnet": ["loss_CDev", "loss_acc_h", "loss_acc_o"],
}


def create_loss_dict(loss_value, loss_out: Dict, round_value=False, mode="baseline") -> Dict[str, float]:
    res = {"loss": float(loss_out.get("loss", loss_out.get("total", loss_value)))}
    for group in MODE_ITEMS.get(mode, MODE_ITEMS["baseline"]):
        keys = LOSS_GROUPS.get(group, [])
        vals = [float(loss_out[k]) for k in keys if k in loss_out]
        if vals:
            v = float(np.sum(vals))
            res[group] = round(v, 4) if round_value else v
    return res


def create_arctic_score_dict(stats: Dict) -> Dict[str, float]:
    keys = ["cdev/ho", "mrrpe/r/l", "mrrpe/r/o", "mpjpe/ra/h", "aae",
            "success_rate/0.05", "acc/h", "acc/o", "mdev/h"]
    return {k: float(stats[k]) for k in keys if k in stats}


def extract_epoch(path: str) -> int:
    m = re.search(r"(\d+)(?:\.pth)?$", path.rstrip("/"))
    return int(m.group(1)) if m else -1
