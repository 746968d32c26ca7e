"""SmoothNet training: frozen base model + temporal smoother.

Parity with `smoothnet_main` (`/root/reference/util/scripts.py:13-70`) and
`train_smoothnet`/`test_smoothnet` (`engine.py:294-534`): run the frozen base
DETR over flattened windows, select per-frame queries, inject sparse
parameter noise, smooth with ArcticSmoother over the window axis, decode and
optimize the contact/acceleration criterion — all fused into one jitted step
(the reference runs base model, noise, smoother and losses as separate
phases).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..data.process import process_targets
from ..evaluation.decode import decode_predictions
from ..losses.criterion import select_queries
from ..models.temporal.smoothnet import ArcticSmoother, inject_param_noise, smoothnet_loss
from .state import TrainState


def make_smoothnet_train_step(
    base_model, base_params, smoother: ArcticSmoother,
    mano_r, mano_l, obj_bank, img_res: float = 224.0, noise_p: float = 0.05,
):
    def loss_fn(sm_params, batch, rng):
        targets = process_targets(batch, mano_r, mano_l, obj_bank, img_res)
        outputs = base_model.apply({"params": base_params}, batch["images"], train=False)
        st = outputs["stacked"]
        last = {k: jax.lax.stop_gradient(v[-1]) for k, v in st.items()}
        selected = select_queries(last)
        selected = inject_param_noise(rng, selected, noise_p)
        smoothed = smoother.apply({"params": sm_params}, selected, train=True,
                                  rngs={"dropout": jax.random.fold_in(rng, 7)})
        pred = decode_predictions(smoothed, targets, mano_r, mano_l, obj_bank, img_res)
        return smoothnet_loss(pred, targets)

    @jax.jit
    def step(state: TrainState, batch, rng):
        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return state.apply_gradients(grads=grads), ld

    return step


def make_smoothnet_eval_step(base_model, base_params, smoother, mano_r, mano_l,
                             obj_bank, img_res: float = 224.0):
    from ..evaluation.metrics import measure_error

    @jax.jit
    def step(sm_params, batch):
        targets = process_targets(batch, mano_r, mano_l, obj_bank, img_res)
        outputs = base_model.apply({"params": base_params}, batch["images"], train=False)
        last = {k: v[-1] for k, v in outputs["stacked"].items()}
        selected = select_queries(last)
        smoothed = smoother.apply({"params": sm_params}, selected, train=False)
        pred = decode_predictions(smoothed, targets, mano_r, mano_l, obj_bank, img_res)
        return measure_error(pred, targets)

    return step


def create_smoother_state(smoother: ArcticSmoother, example_selected, lr: float = 1e-4):
    params = smoother.init({"params": jax.random.PRNGKey(0)}, example_selected)["params"]
    tx = optax.adamw(lr)
    return TrainState.create(apply_fn=smoother.apply, params=params, tx=tx)
