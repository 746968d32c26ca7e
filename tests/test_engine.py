"""Fused train/eval engine over the synthetic dataset (tiny model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvhand_tpu import engine
from uvhand_tpu.data import arctic, loader
from uvhand_tpu.geometry import mano, objects
from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.train.state import create_train_state
from uvhand_tpu.train.checkpoint import save_checkpoint, load_checkpoint, list_checkpoints


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arctic"))
    arctic.make_synthetic_root(d, num_seqs=1, frames=4, views=1)
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(d, "p1", "train", kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
        d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0,
    )
    imgs = jnp.zeros((1, 224, 224, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, imgs)
    return ds, model, params, mano_r, mano_l, bank


@pytest.mark.slow
def test_fused_train_and_eval_epoch(world, tmp_path):
    ds, model, params, mano_r, mano_l, bank = world
    state = create_train_state(model, params, lr=1e-4)
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)
    dl = loader.DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)
    state, stats = engine.train_one_epoch(
        state, step, dl, epoch=0, rng=jax.random.PRNGKey(0), max_steps=2, print_freq=1
    )
    assert np.isfinite(stats["loss"])

    eval_step = engine.make_eval_step(model, mano_r, mano_l, bank)
    dl_val = loader.DataLoader(ds, batch_size=2, num_workers=2, shuffle=False)
    scores = engine.evaluate(state.params, eval_step, dl_val, max_steps=2)
    assert "mpjpe/ra/h" in scores and "cdev/ho" in scores

    # checkpoint roundtrip with not_use_params filtering
    out = str(tmp_path / "ckpt")
    save_checkpoint(out, 0, state)
    ckpts = list_checkpoints(out)
    assert len(ckpts) == 1
    state2 = create_train_state(model, {"params": params["params"]}, lr=1e-4)
    state3 = load_checkpoint(ckpts[0], state2)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state3.params, state.params)
    assert max(jax.tree.leaves(diff)) == 0.0
    # filtered restore keeps fresh values for matching keys
    state4 = load_checkpoint(ckpts[0], state2, not_use_params=["transformer"], load_opt=False)
    d2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state4.params["transformer"], state2.params["transformer"])
    assert max(jax.tree.leaves(d2)) == 0.0


def test_sequence_eval(world):
    ds, model, params, mano_r, mano_l, bank = world
    seq_step = engine.make_sequence_eval_step(model, mano_r, mano_l, bank)
    scores = engine.evaluate_sequences(params["params"], seq_step, ds, batch_size=2)
    assert "acc/h" in scores and "acc/o" in scores and "mdev/h" in scores
    # acc finite (4-frame synthetic sequence gives 2 interior accels)
    assert np.isfinite(scores["acc/h"])
