"""jitted train / eval steps.

Replaces the reference's `train_pose` inner loop (`/root/reference/engine.py:537-696`):
forward + criterion + grad clip + AdamW step compile to one XLA program; with
params replicated and the batch sharded over the mesh's data axis, XLA inserts
the gradient all-reduce that DDP did with NCCL.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..losses.criterion import arctic_criterion
from .state import TrainState


def make_train_step(
    model,
    mano_r,
    mano_l,
    obj_bank,
    img_res: float = 224.0,
    weights: Dict[str, float] | None = None,
    two_stage: bool = True,
    donate: bool = True,
):
    def loss_fn(params, batch, rng):
        outputs = model.apply(
            {"params": params},
            batch["images"],
            train=True,
            rngs={"dropout": rng, "feature_mask": jax.random.fold_in(rng, 1)},
        )
        total, loss_dict = arctic_criterion(
            outputs, batch["targets"], mano_r, mano_l, obj_bank,
            img_res=img_res, weights=weights, two_stage=two_stage,
        )
        return total, loss_dict

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng):
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = state.apply_gradients(grads=grads)
        loss_dict["grad_norm"] = optax_global_norm(grads)
        return new_state, loss_dict

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(params, batch):
        return model.apply({"params": params}, batch["images"], train=False)

    return eval_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
