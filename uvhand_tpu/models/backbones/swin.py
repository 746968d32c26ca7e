"""Swin Transformer backbone (Liu et al. 2021) in flax, NHWC.

Capability parity with `/root/reference/models/swin_transformer.py` (used as
`swin_L_384_22k`: embed 192, depths [2,2,18,2], heads [6,12,24,48], window 12,
out channels [384, 768, 1536] — build at :683-727). Re-implemented from the
paper/public spec: windowed MSA with relative position bias, shifted windows
with attention masks, patch merging, pre-norm blocks, per-output LayerNorm.

TPU notes: window partition is pure reshape/transpose (layout-friendly);
attention over (num_windows*B, 144, C) batches onto the MXU; the shifted-
window mask is precomputed per (H, W) at trace time (static shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H * W // ws // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask, -100 across region boundaries."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = np.reshape(
        img.reshape(1, H // ws, ws, W // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5),
        (-1, ws * ws),
    )
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim**-0.5

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        rpi = relative_position_index(self.window_size)
        bias = rpb_table[rpi.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B_, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]  # (B_, h, N, hd)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, h, N, N)
        # softmax in f32 for bf16 compute modes (logit range ~[-100, 10])
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, train: bool):
        B, L, C = x.shape
        ws = self.window_size
        # the reference DETECTION swin (models/swin_transformer.py:214-240)
        # keeps the cyclic shift even when the padded grid is a single
        # window (stage 3 of 224-input: 7x7 grid, window 7) — unlike the
        # classification impl, which clamps shift to 0 there. Caught by
        # tests/test_swin_parity.py (round 4).
        shift = self.shift

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x).reshape(B, H, W, C)

        # keep the full window size (param shapes stay input-independent,
        # matching torch checkpoints); tiny maps get padded to one window
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, shift))
        else:
            mask = None

        wins = window_partition(x, ws)
        wins = WindowAttention(C, self.num_heads, ws, dtype=self.dtype,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, L, C)

        def drop_path(v, rng_name):
            if self.drop_path <= 0 or not train:
                return v
            keep = 1.0 - self.drop_path
            # fold the site index in so the two drop-path sites of a block
            # draw decorrelated masks
            rng = jax.random.fold_in(
                self.make_rng("dropout"), {"dp1": 1, "dp2": 2}[rng_name]
            )
            m = jax.random.bernoulli(rng, keep, (B, 1, 1)).astype(v.dtype)
            return v * m / keep

        x = shortcut + drop_path(x, "dp1")
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, name="fc2")(y)
        return x + drop_path(y, "dp2")


class PatchMerging(nn.Module):
    dim: int
    dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window_size: int = 12
    out_indices: Sequence[int] = (1, 2, 3)
    drop_path_rate: float = 0.2
    dtype: 'jnp.dtype' = jnp.float32

    @classmethod
    def swin_l_384(cls, **kw):
        return cls(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                   window_size=12, **kw)

    @classmethod
    def swin_t(cls, **kw):
        return cls(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                   window_size=7, **kw)

    @nn.compact
    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        B, H, W, _ = images.shape
        x = nn.Conv(self.embed_dim, (4, 4), strides=4, dtype=self.dtype,
                    name="patch_embed")(images)
        Hc, Wc = x.shape[1], x.shape[2]
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(
            x.reshape(B, -1, self.embed_dim))

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        dim = self.embed_dim
        blk_id = 0
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[si], self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    drop_path=float(dpr[blk_id]), dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, Hc, Wc, train)
                blk_id += 1
            if si in self.out_indices:
                y = nn.LayerNorm(dtype=self.dtype, name=f"out_norm{si}")(x)
                outs.append(y.reshape(B, Hc, Wc, dim))
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{si}")(x, Hc, Wc)
                Hc, Wc = (Hc + 1) // 2, (Wc + 1) // 2
                dim *= 2
        return tuple(outs)


SWIN_L_CHANNELS = (384, 768, 1536)


def convert_swin_checkpoint(state_dict, depths=(2, 2, 18, 2)) -> dict:
    """Map an official torch Swin checkpoint (microsoft/Swin-Transformer
    naming: patch_embed.proj, layers.N.blocks.M.{norm1,attn.qkv,...}) to this
    module's parameter tree."""

    def k(t, conv=False, raw=False):
        a = np.asarray(t)
        if conv and a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and not raw:
            a = a.T
        return jnp.asarray(a, jnp.float32)

    P: dict = {}

    def put(path, val):
        d = P
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = val

    sd = state_dict
    put(("patch_embed", "kernel"), k(sd["patch_embed.proj.weight"], conv=True))
    put(("patch_embed", "bias"), k(sd["patch_embed.proj.bias"]))
    put(("patch_norm", "scale"), k(sd["patch_embed.norm.weight"]))
    put(("patch_norm", "bias"), k(sd["patch_embed.norm.bias"]))

    for si, depth in enumerate(depths):
        for bi in range(depth):
            src = f"layers.{si}.blocks.{bi}"
            dst = f"stage{si}_block{bi}"
            put((dst, "norm1", "scale"), k(sd[f"{src}.norm1.weight"]))
            put((dst, "norm1", "bias"), k(sd[f"{src}.norm1.bias"]))
            put((dst, "attn", "relative_position_bias_table"),
                k(sd[f"{src}.attn.relative_position_bias_table"], raw=True))
            put((dst, "attn", "qkv", "kernel"), k(sd[f"{src}.attn.qkv.weight"]))
            put((dst, "attn", "qkv", "bias"), k(sd[f"{src}.attn.qkv.bias"]))
            put((dst, "attn", "proj", "kernel"), k(sd[f"{src}.attn.proj.weight"]))
            put((dst, "attn", "proj", "bias"), k(sd[f"{src}.attn.proj.bias"]))
            put((dst, "norm2", "scale"), k(sd[f"{src}.norm2.weight"]))
            put((dst, "norm2", "bias"), k(sd[f"{src}.norm2.bias"]))
            put((dst, "fc1", "kernel"), k(sd[f"{src}.mlp.fc1.weight"]))
            put((dst, "fc1", "bias"), k(sd[f"{src}.mlp.fc1.bias"]))
            put((dst, "fc2", "kernel"), k(sd[f"{src}.mlp.fc2.weight"]))
            put((dst, "fc2", "bias"), k(sd[f"{src}.mlp.fc2.bias"]))
        if si < len(depths) - 1:
            put((f"merge{si}", "norm", "scale"), k(sd[f"layers.{si}.downsample.norm.weight"]))
            put((f"merge{si}", "norm", "bias"), k(sd[f"layers.{si}.downsample.norm.bias"]))
            put((f"merge{si}", "reduction", "kernel"),
                k(sd[f"layers.{si}.downsample.reduction.weight"]))
    # out norms: official backbone ckpts name them norm0..norm3 (per out idx)
    for si in (1, 2, 3):
        wkey = f"norm{si}.weight"
        if wkey in sd:
            put((f"out_norm{si}", "scale"), k(sd[wkey]))
            put((f"out_norm{si}", "bias"), k(sd[f"norm{si}.bias"]))
    return {"params": P}
