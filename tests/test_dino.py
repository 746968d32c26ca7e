"""DINO/CDN variant: denoising query construction, masked attention, losses."""

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.models.dn import CdnConfig, cdn_attn_mask, prepare_cdn, dn_losses
from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.losses.criterion import arctic_criterion
from uvhand_tpu.geometry import mano, objects

from test_criterion import make_targets

B, T = 2, 3


def test_cdn_shapes_and_noise(rng):
    cfg = CdnConfig(dn_number=24)  # groups = 4, pad = 24
    assert cfg.groups == 4 and cfg.pad_size == 24
    labels = jnp.asarray([[12, 13, 3], [12, -1, 5]], jnp.int32)
    kps = jnp.asarray(rng.uniform(0.1, 0.9, (B, T, 42)), jnp.float32)
    valid = jnp.asarray([[True, True, True], [True, False, True]])
    dn = prepare_cdn(jax.random.PRNGKey(0), labels, kps, valid, 14, cfg)
    assert dn["dn_labels_noised"].shape == (B, 24)
    assert dn["dn_keys_unact"].shape == (B, 24, 42)
    # negatives get larger noise on average than positives
    neg = np.asarray(dn["dn_is_negative"])
    assert neg.sum() == B * 24 // 2
    keys_gt = np.asarray(dn["dn_keys_gt"])
    keys_no = 1 / (1 + np.exp(-np.asarray(dn["dn_keys_unact"])))
    d_pos = np.abs(keys_no - keys_gt)[~neg].mean()
    d_neg = np.abs(keys_no - keys_gt)[neg].mean()
    assert d_neg > d_pos


def test_cdn_attn_mask_structure():
    cfg = CdnConfig(dn_number=12)  # groups=2, pad=12
    m = np.asarray(cdn_attn_mask(10, cfg))
    P = cfg.pad_size
    assert m.shape == (P + 10, P + 10)
    assert m[P:, :P].all()  # matching can't see dn
    assert not m[P:, P:].any()  # matching sees itself
    per = 6
    assert m[0:per, per:P].all()  # group 0 can't see group 1
    assert not m[0:per, 0:per].any()


def test_dino_model_forward_and_criterion(rng):
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets, _ = make_targets(np.random.default_rng(0), mano_r, mano_l, bank)

    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
        d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0, use_dn=True, dn_number=12,
    )
    imgs = jnp.zeros((B, 64, 64, 3), jnp.float32)
    dn_t = {k: targets[k] for k in ("labels", "keypoints", "target_valid")}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        imgs, train=True, dn_targets=dn_t,
    )
    out = model.apply(
        params, imgs, train=True, dn_targets=dn_t,
        rngs={"dn": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4),
              "feature_mask": jax.random.PRNGKey(5)},
    )
    assert out["pred_logits"].shape == (B, 12, 14)  # dn split off
    assert "dn_outputs" in out
    assert out["dn_outputs"]["pred_logits"].shape[2] == CdnConfig(12).pad_size

    total, ld = arctic_criterion(out, targets, mano_r, mano_l, bank)
    assert np.isfinite(float(total))
    assert "loss_ce_dn" in ld and "loss_key_dn" in ld

    # eval mode: no dn
    out_eval = model.apply(params, imgs, train=False)
    assert "dn_outputs" not in out_eval
    assert out_eval["pred_logits"].shape == (B, 12, 14)


def test_dn_losses_mask_invalid(rng):
    cfg = CdnConfig(dn_number=12)
    labels = jnp.asarray([[12, -1, -1]], jnp.int32)
    kps = jnp.asarray(rng.uniform(0.1, 0.9, (1, 3, 42)), jnp.float32)
    valid = jnp.asarray([[True, False, False]])
    dn = prepare_cdn(jax.random.PRNGKey(0), labels, kps, valid, 14, cfg)
    P = cfg.pad_size
    logits = jnp.zeros((2, 1, P, 14))
    # perfect keys for positives
    hand = jnp.tile(dn["dn_keys_gt"][None], (2, 1, 1, 1))
    ld = dn_losses(logits, hand, hand, dn, jnp.asarray(1.0))
    assert float(ld["loss_key_dn"]) < 1e-6
