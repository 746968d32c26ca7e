"""ConvNeXt backbone (XL config) for the DINO variant.

Capability parity with `/root/reference/models/dino/convnext.py` (Block:18-53,
ConvNeXt:55-150, build_convnext:234-252, `convnext_xlarge_22k` =
depths [3,3,27,3], dims [256,512,1024,2048], out_indices (1,2,3)).

TPU-first: channels-last NHWC end to end (the reference permutes NCHW<->NHWC
inside every block; XLA keeps a single layout), depthwise 7x7 via
`feature_group_count`, pointwise convs as Dense on the feature axis so they
fuse with the surrounding LayerNorm/GELU. `convert_convnext_checkpoint` maps
the released torch `convnext_xlarge_22k` state dict onto this tree.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CONVNEXT_XL_DEPTHS = (3, 3, 27, 3)
CONVNEXT_XL_DIMS = (256, 512, 1024, 2048)
CONVNEXT_XL_CHANNELS = (512, 1024, 2048)  # out_indices (1, 2, 3)


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> Dense 4x -> GELU -> Dense -> layer-scale -> residual
    (+ stochastic depth), convnext.py:18-53."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        x = x * gamma.astype(x.dtype)
        if self.drop_path > 0 and train:
            keep = 1.0 - self.drop_path
            m = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
            ).astype(x.dtype)
            x = x * m / keep
        return shortcut + x


class ConvNeXt(nn.Module):
    depths: Tuple[int, ...] = CONVNEXT_XL_DEPTHS
    dims: Tuple[int, ...] = CONVNEXT_XL_DIMS
    drop_path_rate: float = 0.0
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                # stem: 4x4 s4 conv + LN (convnext.py:78-81)
                x = nn.Conv(dim, (4, 4), strides=4, dtype=self.dtype,
                            name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                # downsample: LN + 2x2 s2 conv (convnext.py:83-88)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down{i}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=2, dtype=self.dtype,
                            name=f"down{i}_conv")(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    dim, drop_path=float(dpr[cur + j]), dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, train=train)
            cur += depth
            if i in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"out_norm{i}")(x)
                )
        return outs

    @classmethod
    def convnext_xl(cls, **kw):
        return cls(depths=CONVNEXT_XL_DEPTHS, dims=CONVNEXT_XL_DIMS, **kw)


def convert_convnext_checkpoint(state_dict,
                                depths=CONVNEXT_XL_DEPTHS) -> dict:
    """torch `convnext_xlarge_22k` state dict -> flax param tree for
    `ConvNeXt` (name map of convnext.py:69-109). Conv kernels OIHW->HWIO;
    depthwise (C,1,7,7)->(7,7,1,C); Linear weights transpose."""

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def conv(prefix):
        w = np_(state_dict[f"{prefix}.weight"])
        k = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        if f"{prefix}.bias" in state_dict:
            k["bias"] = np_(state_dict[f"{prefix}.bias"])
        return k

    def dwconv(prefix, dim):
        w = np_(state_dict[f"{prefix}.weight"])  # (C, 1, 7, 7)
        return {
            "kernel": np.transpose(w, (2, 3, 1, 0)),  # (7, 7, 1, C)
            "bias": np_(state_dict[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {"scale": np_(state_dict[f"{prefix}.weight"]),
                "bias": np_(state_dict[f"{prefix}.bias"])}

    def dense(prefix):
        return {"kernel": np_(state_dict[f"{prefix}.weight"]).T,
                "bias": np_(state_dict[f"{prefix}.bias"])}

    out = {
        "stem_conv": conv("downsample_layers.0.0"),
        "stem_norm": ln("downsample_layers.0.1"),
    }
    for i in range(1, len(depths)):
        out[f"down{i}_norm"] = ln(f"downsample_layers.{i}.0")
        out[f"down{i}_conv"] = conv(f"downsample_layers.{i}.1")
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"stages.{i}.{j}"
            out[f"stage{i}_block{j}"] = {
                "dwconv": dwconv(f"{p}.dwconv", None),
                "norm": ln(f"{p}.norm"),
                "pwconv1": dense(f"{p}.pwconv1"),
                "pwconv2": dense(f"{p}.pwconv2"),
                "gamma": np_(state_dict[f"{p}.gamma"]),
            }
    for i in (1, 2, 3):
        if f"norm{i}.weight" in state_dict:
            out[f"out_norm{i}"] = ln(f"norm{i}")
    return out
