"""SmoothNet-style temporal smoothing over prediction windows.

Capability parity with `/root/reference/models/smoothnet.py`:
  - `Smoother` (:28-63): Linear over the TIME axis (window -> 512 -> 3 res
    blocks (256 hidden, LeakyReLU 0.2, dropout 0.9) -> window),
  - `MotionSmoother` (:66-125): pos/vel/acc branches + fusion linear,
  - `ArcticSmoother` (:128-178): six smoothers over the selected-query
    params (mano root l/r + obj root share; pose l/r share; shape; obj
    rot; obj rad),
  - train-time noise injection (engine.py:337-344),
  - `compute_smoothnet_loss` (loss_arctic_sf.py:402-...): contact-deviation
    + acceleration-error terms (weights util/scripts.py:16-29).

TPU-first: the (B, C, T) linear stack is a batched matmul over tiny T — all
six smoothers and both hands run in a single jitted program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...evaluation.metrics import eval_acc_pose
from ...losses.criterion import CONTACT_DIST


class SmootherResBlock(nn.Module):
    hidden: int = 256
    dropout: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Dense(self.hidden, kernel_init=nn.initializers.xavier_uniform())(x)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Dense(x.shape[-1], kernel_init=nn.initializers.xavier_uniform())(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.leaky_relu(y, 0.2)
        return y + identity


class Smoother(nn.Module):
    window_size: int
    output_size: int
    hidden_size: int = 512
    res_hidden_size: int = 256
    num_blocks: int = 3
    dropout: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool):  # (N, C, T_in)
        x = nn.Dense(self.hidden_size, kernel_init=nn.initializers.xavier_uniform(), name="encoder")(x)
        x = nn.leaky_relu(x, 0.1)
        for i in range(self.num_blocks):
            x = SmootherResBlock(self.res_hidden_size, self.dropout, name=f"res{i}")(x, train)
        return nn.Dense(self.output_size, kernel_init=nn.initializers.xavier_uniform(), name="decoder")(x)


class MotionSmoother(nn.Module):
    window_size: int
    output_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, T, C)
        assert self.window_size >= 3, "MotionSmoother needs window_size >= 3 (acc branch)"
        x = jnp.swapaxes(x, 1, 2)  # (B, C, T)
        pos = x
        vel = x[..., 1:] - x[..., :-1]
        acc = vel[..., 1:] - vel[..., :-1]
        xp = Smoother(self.window_size, self.output_size, name="pos")(pos, train)
        xv = Smoother(self.window_size - 1, self.output_size, name="vel")(vel, train)
        xa = Smoother(self.window_size - 2, self.output_size, name="acc")(acc, train)
        y = jnp.concatenate([xp, xv, xa], axis=2)
        y = nn.Dense(self.output_size, kernel_init=nn.initializers.xavier_uniform(), name="fusion")(y)
        return jnp.swapaxes(y, 1, 2)  # (B, T, C)


class ArcticSmoother(nn.Module):
    window_size: int

    @nn.compact
    def __call__(self, selected: Dict[str, jnp.ndarray], train: bool = False):
        """selected: flat (B*T, ·) params from select_queries; returns same."""
        T = self.window_size
        ws = T

        mano_root = MotionSmoother(ws, ws, name="mano_root")
        obj_root = MotionSmoother(ws, ws, name="obj_root")
        mano_pose = MotionSmoother(ws, ws, name="mano_pose")
        mano_shape = MotionSmoother(ws, ws, name="mano_shape")
        obj_rot = MotionSmoother(ws, ws, name="obj_rot")
        obj_rad = MotionSmoother(ws, ws, name="obj_rad")

        def win(x, d):
            return x.reshape(-1, T, d)

        def flat(x, d):
            return x.reshape(-1, d)

        out = dict(selected)
        out["root.l"] = flat(mano_root(win(selected["root.l"], 3), train), 3)
        out["root.r"] = flat(mano_root(win(selected["root.r"], 3), train), 3)
        out["root.o"] = flat(obj_root(win(selected["root.o"], 3), train), 3)
        out["pose.l"] = flat(mano_pose(win(selected["pose.l"], 48), train), 48)
        out["pose.r"] = flat(mano_pose(win(selected["pose.r"], 48), train), 48)
        out["beta.l"] = flat(mano_shape(win(selected["beta.l"], 10), train), 10)
        out["beta.r"] = flat(mano_shape(win(selected["beta.r"], 10), train), 10)
        out["obj_rot"] = flat(obj_rot(win(selected["obj_rot"], 3), train), 3)
        out["obj_rad"] = flat(
            obj_rad(win(selected["obj_rad"][:, None], 1), train), 1
        )[:, 0]
        return out


def inject_param_noise(rng, selected: Dict[str, jnp.ndarray], p_mask: float = 0.05):
    """Train-time corruption of base-model outputs (engine.py:337-344)."""
    scales = {
        "root.l": 0.1, "root.r": 0.1, "root.o": 0.1,
        "pose.l": 0.1, "pose.r": 0.1,
        "beta.l": 0.1, "beta.r": 0.1,
        "obj_rot": 5.0, "obj_rad": 0.1,
    }
    out = dict(selected)
    for i, (k, s) in enumerate(scales.items()):
        r = jax.random.fold_in(rng, i)
        x = selected[k]
        mask = jax.random.uniform(jax.random.fold_in(r, 0), x.shape) > (1 - p_mask)
        noise = jax.random.normal(jax.random.fold_in(r, 1), x.shape) * s
        out[k] = x + jnp.where(mask, noise, 0.0)
    return out


def smoothnet_loss(pred: Dict[str, jnp.ndarray], gt: Dict[str, jnp.ndarray]):
    """compute_smoothnet_loss: cd + acc/h + acc/o (weights scripts.py:16-29).

    pred/gt are decoded camera-space dicts ordered by time (B*T frames).
    """
    from ...losses.criterion import compute_small_loss  # lazy, avoids cycle

    def contact_dev(v_obj, v_hand, dist, idx, hand_valid):
        corres = jnp.take_along_axis(v_obj, idx[:, :, None], axis=1)
        disp = jnp.linalg.norm(corres - v_hand, axis=-1)
        contact = (dist <= CONTACT_DIST) & (hand_valid[:, None] > 0)
        per = jnp.sum(disp * contact, 1) / jnp.maximum(jnp.sum(contact, 1), 1)
        has = jnp.sum(contact, 1) > 0
        return jnp.sum(per * has) / jnp.maximum(jnp.sum(has), 1)

    is_valid = gt["is_valid"]
    cd = contact_dev(
        pred["object.v.cam"], pred["mano.v3d.cam.r"], gt["dist.ro"], gt["idx.ro"],
        gt["right_valid"] * is_valid,
    ) + contact_dev(
        pred["object.v.cam"], pred["mano.v3d.cam.l"], gt["dist.lo"], gt["idx.lo"],
        gt["left_valid"] * is_valid,
    )

    acc = eval_acc_pose(pred, gt)
    def nan0(x):
        m = ~jnp.isnan(x)
        return jnp.where(jnp.sum(m) > 0, jnp.nansum(x) / jnp.maximum(jnp.sum(m), 1), 0.0)

    losses = {
        "loss/cd": cd,
        "acc/h": nan0(acc["acc/h"]),
        "acc/o": nan0(acc["acc/o"]),
    }
    weights = {"loss/cd": 10.0, "acc/h": 1.0, "acc/o": 1.0}
    total = sum(weights[k] * v for k, v in losses.items())
    losses["total"] = total
    return total, losses
