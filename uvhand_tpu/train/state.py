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


def stochastic_round_bf16(x: jnp.ndarray, key) -> jnp.ndarray:
    """f32 -> bf16 with stochastic rounding (unbiased: E[SR(x)] == x).

    bf16 is the top 16 bits of the f32 pattern, so adding a uniform u16 to
    the low mantissa half and truncating rounds up with probability equal
    to the truncated fraction. Carries propagating into the exponent are
    the CORRECT behavior at binade edges. Not NaN-safe (a carry out of a
    full NaN mantissa would touch the sign bit) — training aborts on NaN
    upstream (engine.py), so params are finite here by contract."""
    bits = jax.random.bits(key, x.shape, jnp.uint16)
    xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    xi = (xi + bits.astype(jnp.uint32)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(xi, jnp.float32).astype(jnp.bfloat16)


def float32_optimizer_state(tx: optax.GradientTransformation):
    """Run `tx` in f32 regardless of the params/grads dtype: moments are
    created f32 (optax would otherwise allocate bf16 Adam nu for bf16
    params) and grads/params are upcast for the update math. Returned
    updates are f32; pair with `SRTrainState` to re-round the sum."""

    def _f32(t):
        return jax.tree.map(lambda a: a.astype(jnp.float32), t)

    def init(params):
        return tx.init(_f32(params))

    def update(grads, state, params=None):
        return tx.update(_f32(grads), state,
                         None if params is None else _f32(params))

    return optax.GradientTransformation(init, update)


class SRTrainState(TrainState):
    """TrainState storing bf16 params with stochastic-rounded updates.

    Drops the fp32 master-copy HBM traffic entirely: params live in bf16,
    the optimizer runs in f32 (see `float32_optimizer_state`), and
    p_new = SR_bf16(f32(p) + update) keeps sub-ulp updates alive in
    expectation — the TPU-native replacement for torch AMP's fp32 master
    weights. Deterministic given (sr_seed, step)."""

    sr_seed: int = 0

    def apply_gradients(self, *, grads, **kwargs):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        key = jax.random.fold_in(
            jax.random.PRNGKey(jnp.uint32(self.sr_seed)), self.step)
        leaves, treedef = jax.tree.flatten(self.params)
        keys = jax.random.split(key, len(leaves))
        uleaves = treedef.flatten_up_to(updates)
        new_leaves = [
            stochastic_round_bf16(p.astype(jnp.float32) + u, k)
            for p, u, k in zip(leaves, uleaves, keys)
        ]
        return self.replace(
            step=self.step + 1,
            params=jax.tree.unflatten(treedef, new_leaves),
            opt_state=new_opt_state,
            **kwargs,
        )


def create_train_state(
    model, params, lr=2e-4, lr_backbone=2e-5, weight_decay=1e-4,
    clip_max_norm=0.1, schedule=None, sgd=False, lr_linear_proj_mult=0.1,
    bf16_params: bool = False, sr_seed: int = 0,
) -> TrainState:
    """`bf16_params=True`: store params in bf16 and apply updates with
    stochastic rounding (use with `compute_dtype=bf16` models; changes
    numerics — opt-in, off the reference-parity path)."""
    p = params["params"] if "params" in params else params
    tx = create_optimizer(
        p,
        lr=lr, lr_backbone=lr_backbone, lr_linear_proj_mult=lr_linear_proj_mult,
        weight_decay=weight_decay, clip_max_norm=clip_max_norm,
        schedule=schedule, sgd=sgd,
    )
    if bf16_params:
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        return SRTrainState.create(
            apply_fn=model.apply, params=p,
            tx=float32_optimizer_state(tx), sr_seed=sr_seed,
        )
    return TrainState.create(
        apply_fn=model.apply,
        params=p,
        tx=tx,
    )
