"""AssemblyHands DETR forward numerical parity vs the REFERENCE torch code.

Closes the last self-certified model seam (VERDICT_R4_RESPONSE "remaining
not-reference-oracled"): the actual reference `DeformableDETR` from
`/root/reference/models/assembly_detr.py` + `assembly_transformer.py` runs
forward on CPU (MSDA substituted by the reference's own pure-torch spec, the
same recipe as the ARCTIC/DINO full-model A/Bs), its random-init state dict
is converted, and our `AssemblyDETR` must reproduce:

  - the two-stage encoder outputs (`enc_outputs.pred_logits/pred_keypoints`,
    `assembly_transformer.py:183-198`),
  - the 3-query class-aware selection incl. the best_score-starts-at-0 loop
    quirk (`:205-225` — with the focal bias init every logit is negative, so
    the object query is forced to index 0),
  - every decoder layer's `pred_logits` and 63-d `pred_keypoints` with the
    reference's exact reference-point bookkeeping: 42-d running refs in the
    sigmoid()*2-0.5 range, hand-only in-decoder refinement with
    mean-then-renorm-then-invsig bases (`:428-466`), and the DETR-forward
    output head's invsig-then-mean bases with the whole 63-d vector (z
    included) squashed sigmoid()*2-0.5 (`assembly_detr.py:173-218`).

Config under test: d=256, 2+2 layers (CPU runtime only — every code path
executes), 224x224, two_stage + with_box_refine (the configuration where the
assembly-specific query selection is active).
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from reference_stubs import import_reference_assembly  # noqa: E402

NUM_CLASSES = 12  # 0 bg-ish, 1..8 objects, 9 left, 10 right (cols hardcoded)


def _args():
    return types.SimpleNamespace(
        backbone="resnet50", lr_backbone=2e-5, num_feature_levels=4,
        dilation=False, position_embedding="sine", hidden_dim=256, nheads=8,
        enc_layers=2, dec_layers=2, dim_feedforward=1024, dropout=0.0,
        dec_n_points=4, enc_n_points=4, two_stage=True, num_queries=3,
    )


def build_reference_model():
    detr_mod, tr_mod = import_reference_assembly()
    from models.backbone import build_backbone  # noqa: E402 (stubbed pkg)

    args = _args()
    torch.manual_seed(0)
    backbone = build_backbone(args)
    cfg = types.SimpleNamespace(hand_idx=[9, 10])
    transformer = tr_mod.build_deforamble_transformer(args, cfg)
    model = detr_mod.DeformableDETR(
        backbone, transformer, num_classes=NUM_CLASSES,
        num_queries=args.num_queries, num_feature_levels=4, aux_loss=True,
        with_box_refine=True, two_stage=True, cfg=cfg,
    )
    model.eval()
    return model, args


def convert_assembly(state_dict, num_encoder_layers, num_decoder_layers,
                     n_heads, num_feature_levels=4):
    """Reference assembly DeformableDETR state dict -> AssemblyDETR params.

    Name contract: encoder/decoder layers are the same stock deformable-DETR
    layers as the ARCTIC model (`train/convert.py` helpers reused); assembly
    adds per-clone cls/key/okey heads and a 3-slot `query_embed` that lives
    on our transformer instead of the DETR wrapper.
    """
    from uvhand_tpu.train.convert import (
        _linear, _mha, _norm, _np, _put, convert_torchvision_resnet50,
    )

    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params: dict = {}

    bb = {k[len("backbone.0.body."):]: v for k, v in sd.items()
          if k.startswith("backbone.0.body.")}
    params["backbone"] = convert_torchvision_resnet50(bb)["params"]

    for i in range(num_feature_levels):
        _put(params, (f"input_proj{i}", "conv", "kernel"),
             _np(sd[f"input_proj.{i}.0.weight"]).transpose(2, 3, 1, 0))
        _put(params, (f"input_proj{i}", "conv", "bias"),
             _np(sd[f"input_proj.{i}.0.bias"]))
        _norm(params, (f"input_proj{i}", "gn"), sd, f"input_proj.{i}.1")

    t = ("transformer",)
    _put(params, t + ("level_embed",), _np(sd["transformer.level_embed"]))
    _put(params, t + ("query_embed",), _np(sd["query_embed.weight"]))
    _linear(params, t + ("enc_output",), sd, "transformer.enc_output")
    _norm(params, t + ("enc_output_norm",), sd, "transformer.enc_output_norm")

    for i in range(num_encoder_layers):
        le = t + (f"enc{i}",)
        src = f"transformer.encoder.layers.{i}"
        for lin in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            _linear(params, le + ("self_attn", lin), sd, f"{src}.self_attn.{lin}")
        _norm(params, le + ("norm1",), sd, f"{src}.norm1")
        _norm(params, le + ("norm2",), sd, f"{src}.norm2")
        _linear(params, le + ("linear1",), sd, f"{src}.linear1")
        _linear(params, le + ("linear2",), sd, f"{src}.linear2")

    for i in range(num_decoder_layers):
        ld = t + (f"dec{i}",)
        src = f"transformer.decoder.layers.{i}"
        for lin in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            _linear(params, ld + ("cross_attn", lin), sd, f"{src}.cross_attn.{lin}")
        _mha(params, ld + ("self_attn",), sd, f"{src}.self_attn", n_heads)
        for n in ("norm1", "norm2", "norm3"):
            _norm(params, ld + (n,), sd, f"{src}.{n}")
        _linear(params, ld + ("linear1",), sd, f"{src}.linear1")
        _linear(params, ld + ("linear2",), sd, f"{src}.linear2")

    num_pred = num_decoder_layers + 1
    for i in range(num_pred):
        _linear(params, t + (f"cls{i}",), sd, f"cls_embed.{i}")
        for j in range(3):
            _linear(params, t + (f"key{i}", f"layer{j}"), sd,
                    f"keypoint_embed.{i}.layers.{j}")
    # the obj keypoint clones are only ever CALLED at the enc stage
    # (obj_keypoint_embed[num_layers], assembly_transformer.py:192) — the
    # decoder-layer clones exist untrained on the torch side and never
    # materialize in the flax tree
    for j in range(3):
        _linear(params, t + (f"okey{num_decoder_layers}", f"layer{j}"), sd,
                f"obj_keypoint_embed.{num_decoder_layers}.layers.{j}")

    return {"params": params}


def build_ours(args, state_dict):
    import jax
    import jax.numpy as jnp

    from uvhand_tpu.models.assembly import AssemblyDETR

    variables = convert_assembly(
        state_dict, num_encoder_layers=args.enc_layers,
        num_decoder_layers=args.dec_layers, n_heads=args.nheads,
        num_feature_levels=args.num_feature_levels,
    )
    model = AssemblyDETR(
        num_classes=NUM_CLASSES, num_feature_levels=args.num_feature_levels,
        d_model=args.hidden_dim, num_encoder_layers=args.enc_layers,
        num_decoder_layers=args.dec_layers,
    )
    imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    ref_tree = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, imgs)
    )
    flat_ref = {jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    flat_conv = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    missing = flat_ref - flat_conv
    extra = flat_conv - flat_ref
    assert not missing, f"converter missed params: {sorted(missing)[:10]}"
    assert not extra, f"converter produced unknown params: {sorted(extra)[:10]}"
    return model, variables


def _cmp(name, ours, ref, atol):
    ref = ref.detach().numpy()
    ours = np.asarray(ours)
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    err = np.abs(ours - ref).max()
    assert err < atol, f"{name}: max err {err:.2e} >= {atol}"


@pytest.mark.slow
def test_reference_parity_assembly_forward():
    import jax.numpy as jnp

    ref_model, args = build_reference_model()
    model, variables = build_ours(args, ref_model.state_dict())

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    out = model.apply(variables, jnp.asarray(img), train=False)

    _cmp("pred_logits", out["pred_logits"], ref_out["pred_logits"], 2e-3)
    _cmp("pred_keypoints", out["pred_keypoints"], ref_out["pred_keypoints"], 2e-3)
    for l, aux_ref in enumerate(ref_out["aux_outputs"]):
        aux = out["aux_outputs"][l]
        _cmp(f"aux{l}_logits", aux["pred_logits"], aux_ref["pred_logits"], 2e-3)
        _cmp(f"aux{l}_keypoints", aux["pred_keypoints"],
             aux_ref["pred_keypoints"], 2e-3)
    enc = out["stacked"]["enc_outputs"]
    _cmp("enc_logits", enc["pred_logits"], ref_out["enc_outputs"]["pred_logits"], 2e-3)
    _cmp("enc_keypoints", enc["pred_keypoints"],
         ref_out["enc_outputs"]["pred_keypoints"], 2e-3)
