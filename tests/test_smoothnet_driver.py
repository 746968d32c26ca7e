"""SmoothNet training over windows on synthetic data (tiny base model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvhand_tpu.data import arctic, loader
from uvhand_tpu.geometry import mano, objects
from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.models.temporal.smoothnet import ArcticSmoother
from uvhand_tpu.train.smoothnet_driver import (
    create_smoother_state, make_smoothnet_eval_step, make_smoothnet_train_step,
)

T = 4


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arctic"))
    arctic.make_synthetic_root(d, num_seqs=1, frames=8, views=1)
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    base_ds = arctic.ArcticDataset(d, "p1", "train", kp3d_cano=np.asarray(bank.kp_bottom))
    wds = arctic.WindowDataset(base_ds, T)
    model = UVHandDETR(num_queries=8, num_encoder_layers=1, num_decoder_layers=2,
                       d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
                       feature_mask_ratio=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
    return wds, model, params["params"], mano_r, mano_l, bank


def test_window_dataset_shapes(world):
    wds, *_ = world
    s = wds[0]
    assert s["images"].shape == (T, 224, 224, 3)
    assert s["labels"].shape == (T, 3)
    batch = arctic.collate_windows([wds[0], wds[1]])
    assert batch["images"].shape == (2 * T, 224, 224, 3)


@pytest.mark.slow
def test_smoothnet_train_step(world):
    wds, model, base_params, mano_r, mano_l, bank = world
    smoother = ArcticSmoother(T)
    batch = arctic.collate_windows([wds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    from uvhand_tpu.losses.criterion import select_queries
    outputs = model.apply({"params": base_params}, batch["images"], train=False)
    sel = select_queries({k: v[-1] for k, v in outputs["stacked"].items()})
    state = create_smoother_state(smoother, sel)

    step = make_smoothnet_train_step(model, base_params, smoother, mano_r, mano_l, bank)
    losses = []
    for i in range(3):
        state, ld = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(ld["total"]))
        assert np.isfinite(losses[-1])

    eval_step = make_smoothnet_eval_step(model, base_params, smoother, mano_r, mano_l, bank)
    scores = eval_step(state.params, batch)
    assert "mpjpe/ra/h" in scores
