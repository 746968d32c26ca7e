"""Train state, optimizer param-groups and LR schedules.

Parity with `set_training_scheduler` (`/root/reference/util/settings.py:373-444`):
AdamW (SGD opt-in) with three param groups — general lr, backbone lr, and
linear-proj (sampling_offsets / reference_points) lr*mult — plus OneCycle or
StepLR schedules and the reference's 0.1 grad-norm clip
(`engine.py:645-648`, `--clip_max_norm`).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def label_params(
    params,
    backbone_keywords: Sequence[str] = ("backbone",),
    linear_proj_keywords: Sequence[str] = ("sampling_offsets", "reference_points"),
):
    """Assign each leaf to 'backbone' | 'linear_proj' | 'general' by path."""

    def label(path, _):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        joined = "/".join(keys)
        if any(k in joined for k in backbone_keywords):
            return "backbone"
        if any(k in joined for k in linear_proj_keywords):
            return "linear_proj"
        return "general"

    return jax.tree_util.tree_map_with_path(label, params)


def onecycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.2):
    """torch OneCycleLR (cos anneal) equivalent."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def step_schedule(lr: float, drop_every_steps: int, gamma: float = 0.1):
    """torch StepLR equivalent (staircase decay)."""
    return lambda step: lr * gamma ** (step // drop_every_steps)


def create_optimizer(
    params,
    lr: float = 2e-4,
    lr_backbone: float = 2e-5,
    lr_linear_proj_mult: float = 0.1,
    weight_decay: float = 1e-4,
    clip_max_norm: float = 0.1,
    schedule: Callable[[Any], Any] | None = None,
    sgd: bool = False,
) -> optax.GradientTransformation:
    """Three param groups like ddetr_in_mmdet (settings.py:397-417)."""
    base = schedule if schedule is not None else (lambda step: lr)

    def scaled(mult_target_lr):
        scale = mult_target_lr / lr
        sched = lambda step: base(step) * scale
        if sgd:
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(sched, momentum=0.9),
            )
        return optax.adamw(sched, weight_decay=weight_decay)

    tx = optax.multi_transform(
        {
            "general": scaled(lr),
            "backbone": scaled(lr_backbone),
            "linear_proj": scaled(lr * lr_linear_proj_mult),
        },
        label_params(params),
    )
    if clip_max_norm and clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx


def create_train_state(
    model, params, lr=2e-4, lr_backbone=2e-5, weight_decay=1e-4,
    clip_max_norm=0.1, schedule=None, sgd=False, lr_linear_proj_mult=0.1,
) -> TrainState:
    tx = create_optimizer(
        params["params"] if "params" in params else params,
        lr=lr, lr_backbone=lr_backbone, lr_linear_proj_mult=lr_linear_proj_mult,
        weight_decay=weight_decay, clip_max_norm=clip_max_norm,
        schedule=schedule, sgd=sgd,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=params["params"] if "params" in params else params,
        tx=tx,
    )
