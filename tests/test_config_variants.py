"""All reference model configs train a step end-to-end (BASELINE configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvhand_tpu.geometry import mano, objects
from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.train.state import create_train_state

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _tiny_targets

B = 2
COMMON = dict(num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
              d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
              feature_mask_ratio=0.0)


@pytest.mark.parametrize("cfg,two_stage", [
    (dict(two_stage=False, with_box_refine=False), False),   # config 1
    (dict(two_stage=True, with_box_refine=True), True),      # config 2 (R50)
    (dict(two_stage=True, with_box_refine=True, use_dn=True, dn_number=2), True),  # config 4 DINO
    (dict(two_stage=True, with_box_refine=True, compute_dtype=jnp.bfloat16), True),  # bf16
])
@pytest.mark.slow
def test_variant_trains(cfg, two_stage):
    model = UVHandDETR(**COMMON, **cfg)
    imgs = jnp.zeros((B, 64, 64, 3), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, imgs,
        train=cfg.get("use_dn", False),
        dn_targets={"labels": _tiny_targets(B)["labels"],
                    "keypoints": _tiny_targets(B)["keypoints"],
                    "target_valid": _tiny_targets(B)["target_valid"]}
        if cfg.get("use_dn") else None,
    )
    state = create_train_state(model, params, lr=1e-4)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)

    from uvhand_tpu.losses.criterion import arctic_criterion

    targets = _tiny_targets(B)

    def loss_fn(p, rng):
        out = model.apply(
            {"params": p}, imgs, train=True,
            dn_targets={k: targets[k] for k in ("labels", "keypoints", "target_valid")}
            if cfg.get("use_dn") else None,
            rngs={"dropout": rng, "feature_mask": jax.random.fold_in(rng, 1),
                  "dn": jax.random.fold_in(rng, 2)},
        )
        return arctic_criterion(out, targets, mano_r, mano_l, bank,
                                two_stage=two_stage)[0]

    total, grads = jax.value_and_grad(loss_fn)(state.params, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_remat_matches_baseline():
    """`remat=True` must be a pure memory/time tradeoff: identical loss and
    gradients (same program, activations recomputed in backprop)."""
    from uvhand_tpu.losses.criterion import arctic_criterion

    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets = _tiny_targets(B)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(B, 64, 64, 3)),
                       jnp.float32)

    def run(remat):
        model = UVHandDETR(**COMMON, two_stage=True, with_box_refine=True,
                           remat=remat)
        params = model.init({"params": jax.random.PRNGKey(0)}, imgs)

        def loss(p):
            out = model.apply({"params": p["params"]}, imgs, train=False)
            return arctic_criterion(out, targets, mano_r, mano_l, bank)[0]

        total, grads = jax.value_and_grad(loss)(params)
        return float(total), grads

    t0, g0 = run(False)
    t1, g1 = run(True)
    assert abs(t0 - t1) < 1e-5 * max(abs(t0), 1)
    # recompute reorders fp32 reductions; ~1e-4 drift is expected, not a
    # semantic difference
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree.leaves(diffs)) < 1e-3, max(jax.tree.leaves(diffs))


def test_drop_matches_nn_dropout_semantics():
    """`transformer.Drop` (2-D uint16-threshold dropout) keeps nn.Dropout's
    contract: identity when deterministic/rate=0; in train mode every
    element is either exactly 0 or exactly x/keep, the keep fraction is
    keep +- quantization (<=2^-16 relative), and the 'dropout' rng
    collection drives the draw (same collection name as nn.Dropout)."""
    from uvhand_tpu.models.transformer import Drop

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 37, 64), jnp.float32)

    # deterministic / rate=0 -> identity, no rng needed
    y = Drop(0.3, deterministic=True).apply({}, x)
    assert (y == x).all()
    y = Drop(0.0, deterministic=False).apply({}, x)
    assert (y == x).all()

    rate, keep = 0.1, 0.9
    y = Drop(rate, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(7)})
    zero = y == 0
    scaled = jnp.abs(y - x / keep) < 1e-6
    assert bool((zero | scaled).all())
    frac = 1.0 - float(zero.mean())
    assert abs(frac - keep) < 0.02, frac

    # different rng keys -> different masks (the draw is actually keyed)
    y2 = Drop(rate, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(8)})
    assert not bool((y == y2).all())

def test_enc_lite_interleaved_update():
    """--enc_lite (Lite-DETR-style interleaved encoder, arXiv:2303.07335):
    weight-compatible with the dense encoder, produces a different (cheaper)
    program, and gradients flow through lo-only layers (the static-slice
    concat path backprops)."""
    from uvhand_tpu.losses.criterion import arctic_criterion
    from uvhand_tpu.models.transformer import EncoderLayer

    cfg = dict(COMMON, two_stage=True, with_box_refine=True)
    cfg["num_encoder_layers"] = 3
    dense = UVHandDETR(**cfg)
    lite = UVHandDETR(**cfg, enc_lite=True, enc_lite_hi_every=2)
    imgs = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 64, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0)}
    pd = dense.init(rngs, imgs)
    pl = lite.init(rngs, imgs)
    # weight-compatible: identical param trees (same names and shapes)
    sd = jax.tree_util.tree_structure(pd)
    sl = jax.tree_util.tree_structure(pl)
    assert sd == sl
    assert all(a.shape == b.shape
               for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pl)))

    od = dense.apply(pd, imgs, train=False)
    ol = lite.apply(pl, imgs, train=False)  # same init params (same rngs)
    a = od["stacked"]["pred_hand_key"]
    b = ol["stacked"]["pred_hand_key"]
    assert a.shape == b.shape
    assert np.isfinite(np.asarray(b, np.float32)).all()
    assert float(jnp.abs(a - b).max()) > 0  # genuinely different program

    # gradients reach the lo-only layer (encoder_layer0: (0+1)%2 != 0)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets = _tiny_targets(B)

    def loss_fn(p):
        out = lite.apply({"params": p}, imgs, train=True,
                         rngs={"dropout": jax.random.PRNGKey(3),
                               "feature_mask": jax.random.PRNGKey(4)})
        return arctic_criterion(out, targets, mano_r, mano_l, bank,
                                two_stage=True)[0]

    total, grads = jax.value_and_grad(loss_fn)(pl["params"])
    assert np.isfinite(float(total))
    enc0 = grads["transformer"]["encoder_layer0"]
    g0 = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(enc0))
    assert np.isfinite(g0) and g0 > 0


def test_encoder_layer_value_default_is_identity():
    """EncoderLayer(value=None) == EncoderLayer(value=src): the lite-path
    plumbing does not perturb the classic self-attention semantics."""
    from uvhand_tpu.models.transformer import (EncoderLayer,
                                               encoder_reference_points)

    layer = EncoderLayer(d_model=32, d_ffn=64, n_levels=1, n_heads=4,
                         n_points=2)
    B, H, W = 2, 4, 4
    src = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, 32))
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, H * W, 32))
    vr = jnp.ones((B, 1, 2))
    ref = encoder_reference_points(((H, W),), vr)
    mask = jnp.zeros((B, H * W), bool)
    p = layer.init(jax.random.PRNGKey(2), src, pos, ref, ((H, W),), mask, False)
    y0 = layer.apply(p, src, pos, ref, ((H, W),), mask, False)
    y1 = layer.apply(p, src, pos, ref, ((H, W),), mask, False, src)
    assert (jnp.asarray(y0) == jnp.asarray(y1)).all()


def test_stochastic_round_bf16_unbiased_and_exact():
    """SR(x) is unbiased between bf16 neighbors, exact on representables,
    always one of the two neighbors, and deterministic per key."""
    from uvhand_tpu.train.state import stochastic_round_bf16

    lo = jnp.float32(jnp.bfloat16(1.0))          # representable
    # bf16 stores 7 mantissa bits: the next value above 1.0 is 1 + 2^-7
    hi = jnp.float32(jnp.asarray(1.0 + 2.0 ** -7, jnp.bfloat16))
    assert float(hi) > float(lo)
    frac = 0.25
    x = lo + (hi - lo) * frac

    # exact on representables (all random draws)
    y = stochastic_round_bf16(jnp.full((1024,), lo), jax.random.PRNGKey(0))
    assert y.dtype == jnp.bfloat16 and (jnp.float32(y) == lo).all()

    y = stochastic_round_bf16(jnp.full((4096,), x), jax.random.PRNGKey(1))
    yf = np.asarray(y, np.float32)
    assert set(np.unique(yf)) <= {float(lo), float(hi)}
    p_up = (yf == float(hi)).mean()
    assert abs(p_up - frac) < 0.03, p_up          # unbiased within noise
    # negative values round toward the matching neighbors too
    yn = stochastic_round_bf16(jnp.full((4096,), -x), jax.random.PRNGKey(2))
    assert set(np.unique(np.asarray(yn, np.float32))) <= {-float(lo), -float(hi)}
    # deterministic per key
    a = stochastic_round_bf16(jnp.full((64,), x), jax.random.PRNGKey(3))
    b = stochastic_round_bf16(jnp.full((64,), x), jax.random.PRNGKey(3))
    assert (jnp.float32(a) == jnp.float32(b)).all()


@pytest.mark.slow
def test_bf16_params_sr_train_state():
    """bf16_params=True: params stored bf16, Adam moments f32, a train
    step applies stochastic-rounded updates and stays finite; sub-ulp
    updates survive in expectation (many params move by one ulp)."""
    from uvhand_tpu.train.state import create_train_state as cts

    model = UVHandDETR(**COMMON, two_stage=True, with_box_refine=True,
                       compute_dtype=jnp.bfloat16)
    imgs = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 64, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, imgs)
    state = cts(model, params, lr=1e-4, bf16_params=True, sr_seed=7)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state.params))
    moment_dtypes = {l.dtype for l in jax.tree.leaves(state.opt_state)
                     if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)}
    assert moment_dtypes == {jnp.dtype(jnp.float32)}, moment_dtypes

    from uvhand_tpu.losses.criterion import arctic_criterion
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets = _tiny_targets(B)

    def loss_fn(p):
        out = model.apply({"params": p}, imgs, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "feature_mask": jax.random.PRNGKey(4)})
        return arctic_criterion(out, targets, mano_r, mano_l, bank,
                                two_stage=True)[0]

    total, grads = jax.value_and_grad(loss_fn)(state.params)
    assert np.isfinite(float(total))
    new_state = state.apply_gradients(grads=grads)
    assert int(new_state.step) == 1
    leaves_new = jax.tree.leaves(new_state.params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves_new)
    moved = sum(int((jnp.float32(a) != jnp.float32(b)).sum())
                for a, b in zip(jax.tree.leaves(state.params), leaves_new))
    assert moved > 0
    fin = all(bool(jnp.isfinite(jnp.float32(l)).all()) for l in leaves_new)
    assert fin
