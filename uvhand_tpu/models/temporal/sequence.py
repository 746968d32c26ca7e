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
        return nn.Dense(C, name="out_proj")(x)


class TemporalParamHead(nn.Module):
    """Refine selected-query params over a window with residual temporal
    attention (drop-in alternative to ArcticSmoother)."""

    window_size: int
    dim: int = 256

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
        for name, d in specs:
            x = selected[name]
            x2 = x.reshape(-1, T, d) if d > 1 else x.reshape(-1, T, 1)
            head = TemporalAttention(self.dim, name=f"ta_{name.replace('.', '_')}")
            y = x2 + head(x2, train)
            out[name] = y.reshape(x.shape)
        return out
