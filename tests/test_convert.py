"""Full-model torch->flax converter: fabricated reference-named state dict
(shapes from the reference source — actic_detr.py:62-160,
arctic_transformer.py:49-71,261-359 — no CUDA needed) must land exactly on
the UVHandDETR parameter tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvhand_tpu.models.detr import UVHandDETR
from uvhand_tpu.train.convert import convert_reference_detr

from test_backbones import _fake_torchvision_state_dict

D = 256
ENC, DEC = 1, 2
NUM_PRED = DEC + 1  # two_stage: extra clone = encoder-output head


def _fake_reference_state_dict(rng):
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(dout).astype(np.float32)

    def norm(name, d=D):
        sd[f"{name}.weight"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(d).astype(np.float32)

    # backbone: Joiner slot 0, IntermediateLayerGetter body = torchvision r50
    for k, v in _fake_torchvision_state_dict(rng).items():
        sd[f"backbone.0.body.{k}"] = v

    for i, cin in enumerate((512, 1024, 2048, 2048)):
        ksz = 3 if i == 3 else 1
        sd[f"input_proj.{i}.0.weight"] = rng.standard_normal((D, cin, ksz, ksz)).astype(np.float32)
        sd[f"input_proj.{i}.0.bias"] = rng.standard_normal(D).astype(np.float32)
        norm(f"input_proj.{i}.1")

    sd["transformer.level_embed"] = rng.standard_normal((4, D)).astype(np.float32)
    for i in range(ENC):
        p = f"transformer.encoder.layers.{i}"
        lin(f"{p}.self_attn.sampling_offsets", D, 256)
        lin(f"{p}.self_attn.attention_weights", D, 128)
        lin(f"{p}.self_attn.value_proj", D, D)
        lin(f"{p}.self_attn.output_proj", D, D)
        norm(f"{p}.norm1"), norm(f"{p}.norm2")
        lin(f"{p}.linear1", D, 1024), lin(f"{p}.linear2", 1024, D)
    for i in range(DEC):
        p = f"transformer.decoder.layers.{i}"
        lin(f"{p}.cross_attn.sampling_offsets", D, 256)
        lin(f"{p}.cross_attn.attention_weights", D, 128)
        lin(f"{p}.cross_attn.value_proj", D, D)
        lin(f"{p}.cross_attn.output_proj", D, D)
        sd[f"{p}.self_attn.in_proj_weight"] = rng.standard_normal((3 * D, D)).astype(np.float32)
        sd[f"{p}.self_attn.in_proj_bias"] = rng.standard_normal(3 * D).astype(np.float32)
        lin(f"{p}.self_attn.out_proj", D, D)
        norm(f"{p}.norm1"), norm(f"{p}.norm2"), norm(f"{p}.norm3")
        lin(f"{p}.linear1", D, 1024), lin(f"{p}.linear2", 1024, D)

    lin("transformer.enc_output", D, D)
    norm("transformer.enc_output_norm")
    lin("transformer.pos_trans.0", 5376, 1024)
    lin("transformer.pos_trans.2", 1024, 1024)
    lin("transformer.pos_trans.4", 1024, 512)
    norm("transformer.pos_trans_norm", 512)
    sd["transformer.two_stage_learn_xy.weight"] = rng.standard_normal((1, 40)).astype(np.float32)

    for i in range(NUM_PRED):
        lin(f"cls_embed.{i}", D, 14)
        for j, (din, dout) in enumerate(((D, D), (D, D), (D, 42))):
            lin(f"key_embed.{i}.layers.{j}", din, dout)
            lin(f"obj_key_embed.{i}.layers.{j}", din, dout)
    # shared heads registered num_pred times (same tensors)
    for name, dout in (("mano_pose_embed", 48), ("mano_beta_embed", 10),
                       ("hand_cam", 3), ("obj_cam", 3), ("obj_rot", 3), ("obj_rad", 1)):
        lin(f"{name}.0", D, dout)
        for i in range(1, NUM_PRED):
            sd[f"{name}.{i}.weight"] = sd[f"{name}.0.weight"]
            sd[f"{name}.{i}.bias"] = sd[f"{name}.0.bias"]
    # non-two-stage query embedding always exists in the reference
    sd["query_embed.weight"] = rng.standard_normal((300, 2 * D)).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def converted(rng_module):
    sd = _fake_reference_state_dict(rng_module)
    # the reference saves {'model': sd} and DDP prefixes 'module.'
    wrapped = {"model": {f"module.{k}": v for k, v in sd.items()}}
    params = convert_reference_detr(
        wrapped, num_decoder_layers=DEC, num_encoder_layers=ENC, two_stage=True
    )
    return sd, params


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(11)


@pytest.mark.slow
def test_tree_matches_model_init_exactly(converted):
    sd, params = converted
    model = UVHandDETR(num_encoder_layers=ENC, num_decoder_layers=DEC)
    init = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))

    def paths(tree):
        return {
            "/".join(str(x.key) for x in k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got, want = paths(params), paths(init)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, mismatched


def test_values_roundtrip(converted):
    sd, params = converted
    p = params["params"]
    # linear transpose
    np.testing.assert_array_equal(
        p["transformer"]["cls_head0"]["kernel"], sd["cls_embed.0.weight"].T
    )
    # conv OIHW -> HWIO
    np.testing.assert_array_equal(
        p["input_proj0"]["conv"]["kernel"],
        sd["input_proj.0.0.weight"].transpose(2, 3, 1, 0),
    )
    # MHA in_proj split: query slice
    q = sd["transformer.decoder.layers.0.self_attn.in_proj_weight"][:D].T
    np.testing.assert_array_equal(
        p["transformer"]["decoder_layer0"]["self_attn"]["query"]["kernel"],
        q.reshape(D, 8, 32),
    )
    np.testing.assert_array_equal(
        p["transformer"]["two_stage_learn_xy"],
        sd["transformer.two_stage_learn_xy.weight"].reshape(-1),
    )


def test_mha_numerics_match_torch(rng_module):
    """Converted flax MHA == torch nn.MultiheadAttention on random input."""
    import torch
    from flax import linen as nn

    rng = rng_module
    tm = torch.nn.MultiheadAttention(D, 8, batch_first=True)
    sd = {f"self_attn.{k}": v for k, v in tm.state_dict().items()}
    from uvhand_tpu.train.convert import _mha

    tree = {}
    _mha(tree, ("self_attn",), sd, "self_attn", 8)

    x = rng.standard_normal((2, 7, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = tm(torch.as_tensor(x), torch.as_tensor(x), torch.as_tensor(x))

    fm = nn.MultiHeadDotProductAttention(num_heads=8, deterministic=True)
    got = fm.apply(
        {"params": jax.tree.map(jnp.asarray, tree["self_attn"])},
        inputs_q=jnp.asarray(x), inputs_k=jnp.asarray(x), inputs_v=jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-5)


def test_resume_from_pth_file(converted, rng_module, tmp_path):
    """--resume path.pth: torch.save'd {'model': sd} loads onto a TrainState
    with not_use_params filtering."""
    import torch

    from uvhand_tpu.train.checkpoint import load_torch_pth
    from uvhand_tpu.train.state import create_train_state

    sd, _ = converted
    p = str(tmp_path / "checkpoint.pth")
    torch.save({"model": {k: torch.as_tensor(v) for k, v in sd.items()}, "epoch": 3}, p)

    model = UVHandDETR(num_encoder_layers=ENC, num_decoder_layers=DEC)
    init = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
    state = create_train_state(model, init, lr=1e-4)
    state2 = load_torch_pth(
        p, state, not_use_params=["cls_head"],
        num_decoder_layers=DEC, num_encoder_layers=ENC, two_stage=True,
    )
    # filtered params keep fresh init; others match the torch values
    np.testing.assert_array_equal(
        np.asarray(state2.params["transformer"]["cls_head0"]["kernel"]),
        np.asarray(state.params["transformer"]["cls_head0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state2.params["mano_pose_head"]["kernel"]),
        sd["mano_pose_embed.0.weight"].T,
    )


def test_converted_forward_runs(converted):
    _, params = converted
    model = UVHandDETR(num_encoder_layers=ENC, num_decoder_layers=DEC)
    params = jax.tree.map(jnp.asarray, params)
    out = model.apply(params, jnp.zeros((1, 224, 224, 3)))
    assert out["pred_logits"].shape == (1, 300, 14)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
