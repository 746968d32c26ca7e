"""Temporal sequence heads over prediction windows.

Capability parity with the reference's temporal designs:
  - the ARCTIC-baseline LSTM head
    (`/root/reference/arctic_tools/src/models/arctic_lstm/model.py:36-61`)
    and the GRU variant commented out of the DETR head
    (`actic_detr.py:104-107,273-280`) — here a bidirectional LSTM as
    `jax.lax.scan` (compiler-friendly, no cuDNN),
  - the ViViT-style temporal attention head (BASELINE.json rebuild target;
    the reference's `models/vivit.py` is dead code) — pre-norm transformer
    blocks attending over the window axis with learned temporal position
    embeddings.

Both operate on (B, T, C) windows of per-frame query features or params and
preserve shape, so they slot between `select_queries` and the decode heads
exactly like ArcticSmoother.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTMCellScan(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, xs):  # (B, T, C) -> (B, T, H)
        return nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="rnn")(xs)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over T (arctic_lstm model.py:36-42 equivalent)."""

    hidden: int

    @nn.compact
    def __call__(self, xs):  # (B, T, C) -> (B, T, 2*hidden)
        fwd = LSTMCellScan(self.hidden, name="fwd")(xs)
        bwd = LSTMCellScan(self.hidden, name="bwd")(xs[:, ::-1])[:, ::-1]
        return jnp.concatenate([fwd, bwd], -1)


class TemporalAttention(nn.Module):
    """ViViT-style pre-norm temporal transformer over the window axis."""

    dim: int
    depth: int = 2
    heads: int = 4
    mlp_ratio: float = 2.0
    max_window: int = 64

    @nn.compact
    def __call__(self, xs, train: bool = False):  # (B, T, C) -> (B, T, C)
        B, T, C = xs.shape
        pos = self.param(
            "temporal_pos", nn.initializers.normal(0.02), (self.max_window, self.dim)
        )
        x = nn.Dense(self.dim, name="in_proj")(xs) + pos[None, :T]
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, deterministic=not train, name=f"attn_{i}"
            )(y, y, y)
            x = x + y
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(int(self.dim * self.mlp_ratio), name=f"fc1_{i}")(y)
            y = nn.Dense(self.dim, name=f"fc2_{i}")(nn.gelu(y))
            x = x + y
        # zero-init: used as a residual branch (TemporalParamHead), the head
        # starts as identity — a random perturbation of the selected params
        # can push the weak-perspective scale toward 0 and spike the camera
        # losses 1e14+ (observed in the round-5 ab_temporal study)
        return nn.Dense(C, kernel_init=nn.initializers.zeros,
                        name="out_proj")(x)


class TemporalLSTMBlock(nn.Module):
    """Residual-ready BiLSTM block (arctic_lstm model.py:36-61 design: a
    bidirectional LSTM whose 2*hidden output preserves the feature width,
    followed by per-frame heads — here a Dense back to the input width)."""

    dim: int

    @nn.compact
    def __call__(self, xs, train: bool = False):  # (B, T, C) -> (B, T, C)
        B, T, C = xs.shape
        h = nn.Dense(self.dim, name="in_proj")(xs)
        h = BiLSTM(self.dim // 2, name="bilstm")(h)  # (B, T, dim)
        # zero-init residual branch (see TemporalAttention.out_proj note)
        return nn.Dense(C, kernel_init=nn.initializers.zeros,
                        name="out_proj")(h)


class TemporalParamHead(nn.Module):
    """Refine selected-query params over a window with a residual temporal
    mixer (drop-in alternative to ArcticSmoother).

    kind: "vivit" = TemporalAttention blocks (BASELINE config-5 "ViViT
    temporal encoder"); "lstm" = BiLSTM blocks (the arctic_lstm design,
    `/root/reference/arctic_tools/src/models/arctic_lstm/model.py:36-61`,
    applied at the selected-param level — the reference mixes backbone
    features; params are the TPU-friendly (B, T, <=48) equivalent surface
    that slots into the DETR pipeline without a feature cache).

    Rows are padded (last-row repeat) up to a multiple of window_size so a
    B=1 init trace creates the same params as a full window batch."""

    window_size: int
    dim: int = 256
    kind: str = "vivit"

    @nn.compact
    def __call__(self, selected, train: bool = False):
        T = self.window_size
        out = dict(selected)
        specs = [
            ("root.l", 3), ("root.r", 3), ("root.o", 3),
            ("pose.l", 48), ("pose.r", 48),
            ("beta.l", 10), ("beta.r", 10),
            ("obj_rot", 3), ("obj_rad", 1),
        ]
        block = {"vivit": TemporalAttention, "lstm": TemporalLSTMBlock}[self.kind]
        for name, d in specs:
            x = selected[name]
            flat = x.reshape(-1, d)
            B = flat.shape[0]
            pad = (-B) % T
            if pad:
                flat = jnp.concatenate([flat, jnp.tile(flat[-1:], (pad, 1))], 0)
            x2 = flat.reshape(-1, T, d)
            head = block(self.dim, name=f"ta_{name.replace('.', '_')}")
            y = x2 + head(x2, train)
            out[name] = y.reshape(-1, d)[:B].reshape(x.shape)
        return out
