"""ResNet-50 backbone with frozen BatchNorm, NHWC, pure flax.

Capability parity with `/root/reference/models/backbone.py:27-110`
(`FrozenBatchNorm2d`, `BackboneBase` with return_interm_layers): returns
layer2/3/4 feature maps (strides 8/16/32, channels 512/1024/2048).

Frozen BN statistics/affine params are ordinary (never-updated) parameters so
a torchvision checkpoint can be converted 1:1 (`convert_torchvision_resnet50`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params (backbone.py:27).

    Params stay fp32; the affine is applied in the activation dtype so a bf16
    compute path keeps bf16 activations end to end (no fp32 round trips)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # all four are trained never; callers exclude 'backbone/.*(mean|var)'
        # (and optionally scale/bias) from the optimizer, like the reference
        # freezes BN entirely.
        inv = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


class StemConv(nn.Module):
    """The 7x7 stride-2 stem conv, optionally as a space-to-depth rewrite.

    The 3-input-channel 7x7 conv starves the MXU (contraction dim 147 of
    which only 3 channels are dense per tap; XLA feeds the systolic array at
    a few percent utilization). The MLPerf-style rewrite pads the kernel to
    8x8, space-to-depths the (padded) input by the stride (2x2 -> 12
    channels) and runs an equivalent 4x4 stride-1 conv — the SAME function
    of the SAME (7,7,3,64) parameter (exact in exact arithmetic; summation
    order differs, so bf16/fp32 results drift by ~1 ulp of the conv).

    The parameter keeps the nn.Conv layout (`kernel` (7,7,3,64) HWIO) so
    torchvision conversion and checkpoints are identical either way.
    """

    s2d: bool = False
    dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, 64)).astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        # the s2d rewrite needs even padded H/W to fold the stride-2 into
        # channels; odd --img_res (H+6 odd) falls back to the plain conv
        # (same function either way) instead of failing at trace time
        if not self.s2d or (x.shape[1] + 6) % 2 or (x.shape[2] + 6) % 2:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        b, h, w, c = xp.shape
        y = xp.reshape(b, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,3,64)
        ks = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        ks = ks.reshape(4, 4, 4 * c, 64)
        return jax.lax.conv_general_dilated(
            y, ks, (1, 1), "VALID", dimension_numbers=dn)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="down_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Returns (c3, c4, c5): strides 8/16/32, channels 512/1024/2048."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    return_interm_layers: bool = True
    dtype: 'jnp.dtype' = jnp.float32  # conv compute dtype (params stay fp32)
    stem_s2d: bool = False  # space-to-depth stem (see StemConv)

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3)
        x = x.astype(self.dtype)
        x = StemConv(s2d=self.stem_s2d, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        for li, (n_blocks, p) in enumerate(zip(self.blocks, planes)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = Bottleneck(
                    p, stride=stride, downsample=(bi == 0), dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            if li >= 1:
                outs.append(x)
        if self.return_interm_layers:
            return tuple(outs)  # (c3, c4, c5)
        return (outs[-1],)


RESNET50_CHANNELS = (512, 1024, 2048)
RESNET50_STRIDES = (8, 16, 32)

# ImageNet normalization (reference uses torchvision transforms)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def convert_torchvision_resnet50(state_dict) -> dict:
    """Map a torchvision resnet50 state_dict (torch tensors or numpy) to this
    module's parameter pytree {'params': ...}. Conv kernels OIHW -> HWIO.
    """

    def k(t):
        a = np.asarray(t)
        if a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)
        return jnp.asarray(a, jnp.float32)

    params: dict = {}

    def put(path, val):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = val

    def bn(dst, src):
        put((dst, "scale"), k(state_dict[f"{src}.weight"]))
        put((dst, "bias"), k(state_dict[f"{src}.bias"]))
        put((dst, "mean"), k(state_dict[f"{src}.running_mean"]))
        put((dst, "var"), k(state_dict[f"{src}.running_var"]))

    put(("conv1", "kernel"), k(state_dict["conv1.weight"]))
    bn("bn1", "bn1")
    blocks = (3, 4, 6, 3)
    for li, n in enumerate(blocks):
        for bi in range(n):
            name = f"layer{li + 1}_{bi}"
            src = f"layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                put((name, f"conv{ci}", "kernel"), k(state_dict[f"{src}.conv{ci}.weight"]))
                bn_dst = params.setdefault(name, {})
                put((name, f"bn{ci}", "scale"), k(state_dict[f"{src}.bn{ci}.weight"]))
                put((name, f"bn{ci}", "bias"), k(state_dict[f"{src}.bn{ci}.bias"]))
                put((name, f"bn{ci}", "mean"), k(state_dict[f"{src}.bn{ci}.running_mean"]))
                put((name, f"bn{ci}", "var"), k(state_dict[f"{src}.bn{ci}.running_var"]))
            if f"{src}.downsample.0.weight" in state_dict:
                put((name, "down_conv", "kernel"), k(state_dict[f"{src}.downsample.0.weight"]))
                put((name, "down_bn", "scale"), k(state_dict[f"{src}.downsample.1.weight"]))
                put((name, "down_bn", "bias"), k(state_dict[f"{src}.downsample.1.bias"]))
                put((name, "down_bn", "mean"), k(state_dict[f"{src}.downsample.1.running_mean"]))
                put((name, "down_bn", "var"), k(state_dict[f"{src}.downsample.1.running_var"]))
    return {"params": params}
