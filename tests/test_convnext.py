"""ConvNeXt backbone: structure, DETR integration, torch converter.

Parity target: `/root/reference/models/dino/convnext.py` (Block:18-53,
forward_features:121-131, build_convnext:234-252).
"""

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.models.backbones.convnext import (
    ConvNeXt, convert_convnext_checkpoint,
)

DEPTHS = (2, 2, 2, 2)
DIMS = (16, 32, 64, 128)


def test_convnext_feature_pyramid(rng):
    m = ConvNeXt(depths=DEPTHS, dims=DIMS)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)
    outs = m.apply(params, x)
    # strides 8/16/32 (out_indices 1,2,3 after the s4 stem)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def _fabricate_torch_sd(rng):
    """Reference-named state dict with reference shapes (convnext.py:69-109),
    no torch needed."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.05

    add("downsample_layers.0.0.weight", DIMS[0], 3, 4, 4)
    add("downsample_layers.0.0.bias", DIMS[0])
    add("downsample_layers.0.1.weight", DIMS[0])
    add("downsample_layers.0.1.bias", DIMS[0])
    for i in range(1, 4):
        add(f"downsample_layers.{i}.0.weight", DIMS[i - 1])
        add(f"downsample_layers.{i}.0.bias", DIMS[i - 1])
        add(f"downsample_layers.{i}.1.weight", DIMS[i], DIMS[i - 1], 2, 2)
        add(f"downsample_layers.{i}.1.bias", DIMS[i])
    for i, depth in enumerate(DEPTHS):
        for j in range(depth):
            p = f"stages.{i}.{j}"
            add(f"{p}.dwconv.weight", DIMS[i], 1, 7, 7)
            add(f"{p}.dwconv.bias", DIMS[i])
            add(f"{p}.norm.weight", DIMS[i])
            add(f"{p}.norm.bias", DIMS[i])
            add(f"{p}.pwconv1.weight", 4 * DIMS[i], DIMS[i])
            add(f"{p}.pwconv1.bias", 4 * DIMS[i])
            add(f"{p}.pwconv2.weight", DIMS[i], 4 * DIMS[i])
            add(f"{p}.pwconv2.bias", DIMS[i])
            add(f"{p}.gamma", DIMS[i])
    for i in (1, 2, 3):
        add(f"norm{i}.weight", DIMS[i])
        add(f"norm{i}.bias", DIMS[i])
    return sd


def test_convnext_converter_matches_torch_math(rng):
    """Converted params reproduce the reference block math (torch oracle on
    one block: dwconv -> LN -> linear -> gelu -> linear -> gamma -> res)."""
    import torch
    import torch.nn.functional as F

    sd = _fabricate_torch_sd(rng)
    m = ConvNeXt(depths=DEPTHS, dims=DIMS)
    x_np = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    x = jnp.asarray(x_np)
    init = m.init({"params": jax.random.PRNGKey(0)}, x)
    conv = convert_convnext_checkpoint(sd, depths=DEPTHS)
    # converted tree structurally matches the flax init
    flat_i = jax.tree_util.tree_leaves_with_path(init["params"])
    flat_c = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(conv)}
    for k, v in flat_i:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_c, ks
        assert flat_c[ks].shape == v.shape, (ks, flat_c[ks].shape, v.shape)

    outs = m.apply({"params": conv}, x)

    # torch oracle (channels-first, reference ops)
    t = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
    t = F.conv2d(t, torch.from_numpy(sd["downsample_layers.0.0.weight"]),
                 torch.from_numpy(sd["downsample_layers.0.0.bias"]), stride=4)
    t = t.permute(0, 2, 3, 1)
    t = F.layer_norm(t, (DIMS[0],),
                     torch.from_numpy(sd["downsample_layers.0.1.weight"]),
                     torch.from_numpy(sd["downsample_layers.0.1.bias"]), eps=1e-6)
    t = t.permute(0, 3, 1, 2)
    for i in range(4):
        if i > 0:
            t = t.permute(0, 2, 3, 1)
            t = F.layer_norm(t, (DIMS[i - 1],),
                             torch.from_numpy(sd[f"downsample_layers.{i}.0.weight"]),
                             torch.from_numpy(sd[f"downsample_layers.{i}.0.bias"]),
                             eps=1e-6)
            t = t.permute(0, 3, 1, 2)
            t = F.conv2d(t, torch.from_numpy(sd[f"downsample_layers.{i}.1.weight"]),
                         torch.from_numpy(sd[f"downsample_layers.{i}.1.bias"]),
                         stride=2)
        for j in range(DEPTHS[i]):
            p = f"stages.{i}.{j}"
            inp = t
            t = F.conv2d(t, torch.from_numpy(sd[f"{p}.dwconv.weight"]),
                         torch.from_numpy(sd[f"{p}.dwconv.bias"]),
                         padding=3, groups=DIMS[i])
            t = t.permute(0, 2, 3, 1)
            t = F.layer_norm(t, (DIMS[i],), torch.from_numpy(sd[f"{p}.norm.weight"]),
                             torch.from_numpy(sd[f"{p}.norm.bias"]), eps=1e-6)
            t = F.linear(t, torch.from_numpy(sd[f"{p}.pwconv1.weight"]),
                         torch.from_numpy(sd[f"{p}.pwconv1.bias"]))
            t = F.gelu(t)
            t = F.linear(t, torch.from_numpy(sd[f"{p}.pwconv2.weight"]),
                         torch.from_numpy(sd[f"{p}.pwconv2.bias"]))
            t = torch.from_numpy(sd[f"{p}.gamma"]) * t
            t = inp + t.permute(0, 3, 1, 2)
        if i == 3:
            ref = t.permute(0, 2, 3, 1)
            ref = F.layer_norm(ref, (DIMS[i],),
                               torch.from_numpy(sd[f"norm{i}.weight"]),
                               torch.from_numpy(sd[f"norm{i}.bias"]), eps=1e-6)
            np.testing.assert_allclose(
                np.asarray(outs[-1]), ref.detach().numpy(), rtol=2e-4, atol=2e-5)


def test_convnext_in_detr(rng):
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.models.backbones import convnext as cx

    # shrink the XL config for the smoke test
    orig = (cx.CONVNEXT_XL_DEPTHS, cx.CONVNEXT_XL_DIMS, cx.CONVNEXT_XL_CHANNELS)
    cx.CONVNEXT_XL_DEPTHS, cx.CONVNEXT_XL_DIMS = DEPTHS, DIMS
    cx.CONVNEXT_XL_CHANNELS = DIMS[1:]
    try:
        model = UVHandDETR(
            num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
            d_model=64, dim_feedforward=64, n_heads=4, dropout=0.0,
            feature_mask_ratio=0.0, backbone="convnext_xlarge_22k",
        )
        imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, imgs)
        out = model.apply(params, imgs, train=False)
        assert out["stacked"]["pred_logits"].shape[1:] == (1, 8, 14)
    finally:
        (cx.CONVNEXT_XL_DEPTHS, cx.CONVNEXT_XL_DIMS,
         cx.CONVNEXT_XL_CHANNELS) = orig
