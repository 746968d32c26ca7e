"""Deformable transformer with 42-dim (21-keypoint) reference points.

Capability parity with `/root/reference/models/arctic_transformer.py`:
  - encoder: MSDA self-attention over flattened multi-scale features with
    per-level embeddings and grid reference points (:303-331),
  - two-stage proposals: per-location grid + learned 40-d xy spread -> 42-d
    proposal (:106-142, :70-71), encoder-output class/keypoint heads and
    class-aware top-k with hand/object keypoint substitution (:193-231),
  - proposal positional embedding 42x128 -> MLP(5376->1024->1024->512)+LN
    (:55-63, :91-104),
  - decoder: MHA self-attn + MSDA cross-attn, iterative reference refinement
    gated by per-layer argmax class (hand classes {12,13}; class 0 frozen)
    (:334-456); reference points live in [-1,1] via `sigmoid()*2-1` (:230,
    :445) — a deliberate parity quirk of the reference.

TPU-first notes: everything is static-shape; the class-gated scatter updates
become `jnp.where` selects; the per-layer Python loop unrolls into one XLA
program (6 layers, distinct params — scan would force weight stacking and
block per-layer head sharing, and compile time is fine at this depth).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msda import MSDeformAttn
from .posenc import interleaved_sincos


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """DETR inverse_sigmoid (util/misc.py): clamp to [0,1] then logit."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


class Drop(nn.Module):
    """Dropout with the random draw shaped 2-D and thresholded at 16 bits.

    Semantics of `nn.Dropout` (inverted scaling, per-element keep mask,
    'dropout' rng collection), with two TPU cost fixes measured on the
    train-step profile (2026-08-19, B=16):
      - flax's 3-D bernoulli makes XLA emit the rng-bit-generator in a
        {2,0,1} layout that costs a ~125 us relayout pass per mask; the
        2-D draw keeps the natural row-major layout (the reshape back is
        a bitcast) and the compare fuses into the consumer.
      - `bernoulli` burns 32 random bits per element (a 68 MB u32 write +
        read per (B,1045,1024) FFN mask); 16-bit thresholding halves that
        rng traffic. Keep-probability quantization error is <=2^-17
        relative (flax's own u32->f32 path is itself quantized at 2^-24).
    """

    rate: float
    deterministic: bool

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        lead = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        bits = jax.random.bits(
            self.make_rng("dropout"), (lead, x.shape[-1]), jnp.uint16
        ).reshape(x.shape)
        thresh = jnp.uint16(min(round(keep * 65536.0), 65535))
        return jnp.where(bits < thresh, x / keep, jnp.zeros((), x.dtype))


class MLP(nn.Module):
    """ReLU MLP; last layer linear (actic_detr.py:572-584)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    # last-layer kernel init (DINO zero-inits its key MLPs, dino.py:155-158)
    last_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(
            self.output_dim,
            name=f"layer{self.num_layers - 1}",
            kernel_init=self.last_init or nn.initializers.xavier_uniform(),
        )(x)


class EncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    compute_dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, padding_mask, train: bool,
                 value=None):
        # `value`: optional full token sequence to sample from when `src` is
        # only a subset of the queries (lite-encoder interleaved update);
        # None = classic self-attention (values == queries)
        dt = self.compute_dtype
        q = src if pos is None else src + pos
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                            compute_dtype=dt, name="self_attn")(
            q, reference_points, src if value is None else value,
            spatial_shapes, padding_mask
        )
        src = src + Drop(self.dropout, deterministic=not train)(src2)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        ff = nn.Dense(self.d_ffn, dtype=dt, name="linear1")(src)
        ff = Drop(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=dt, name="linear2")(ff).astype(jnp.float32)
        src = src + Drop(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


class DecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    compute_dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes, src_padding_mask, train: bool, self_attn_mask=None):
        dt = self.compute_dtype
        q = tgt if query_pos is None else tgt + query_pos
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=dt,
            name="self_attn",
        )(
            inputs_q=q, inputs_k=q, inputs_v=tgt,
            # flax mask: True = attend; cdn mask passes True = blocked
            mask=None if self_attn_mask is None else ~self_attn_mask[None, None],
        )
        tgt = tgt + Drop(self.dropout, deterministic=not train)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)

        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                            compute_dtype=dt, name="cross_attn")(
            tgt if query_pos is None else tgt + query_pos,
            reference_points,
            src,
            spatial_shapes,
            src_padding_mask,
        )
        tgt = tgt + Drop(self.dropout, deterministic=not train)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        ff = nn.Dense(self.d_ffn, dtype=dt, name="linear1")(tgt)
        ff = Drop(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=dt, name="linear2")(ff).astype(jnp.float32)
        tgt = tgt + Drop(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Grid reference points (arctic_transformer.py:309-323). -> (B, S, L, 2)."""
    refs = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ry = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
        rx = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        ry = jnp.tile(ry, (1, W)).reshape(-1)
        rx = jnp.tile(rx, (H, 1)).reshape(-1)
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * H)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * W)
        refs.append(jnp.stack([rx, ry], -1))
    ref = jnp.concatenate(refs, 1)  # (B, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]


def proposal_pos_embed(proposals: jnp.ndarray, num_pos_feats: int = 128,
                       dtype=jnp.float32) -> jnp.ndarray:
    """42-d unactivated proposal -> (B, Q, 42*128) sine embedding
    (arctic_transformer.py:91-104). Sines are computed in f32; `dtype`
    casts before the big reshape so the relayout copy feeding the
    pos_trans GEMM moves half the bytes in the bf16 mode."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    p = jax.nn.sigmoid(proposals) * scale
    pos = interleaved_sincos(p[..., None] / dim_t)  # (B, Q, 42, 128)
    return pos.astype(dtype).reshape(pos.shape[0], pos.shape[1], -1)


def sine_embed_42(pos: jnp.ndarray) -> jnp.ndarray:
    """DINO per-layer query position embedding for 42-d reference points:
    mean over the 21 x / 21 y coords -> 128-d sin/cos each -> (B, Q, 256),
    ordered [y, x] (`models/dino/utils.py:138-166
    gen_sineembed_for_position`)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(128, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / 128)
    x = jnp.mean(pos[..., 0::2], -1) * scale  # (B, Q)
    y = jnp.mean(pos[..., 1::2], -1) * scale

    def embed(v):
        return interleaved_sincos(v[..., None] / dim_t)  # (B, Q, 128)

    return jnp.concatenate([embed(y), embed(x)], -1)


# sentinel for invalid two-stage proposals; sigmoid(1e4) == 1.0 in fp32 like
# the reference's float('inf') but NaN-safe under autodiff
INVALID_PROPOSAL = 1e4

HAND_CLASSES = (12, 13)  # left, right (cfg.py ARCTIC class table)
FROZEN_CLASSES = (0,)  # argmax==0 queries get no reference update


def _class_masks(class_indices: jnp.ndarray):
    hand = jnp.zeros_like(class_indices, dtype=bool)
    for c in HAND_CLASSES:
        hand |= class_indices == c
    obj = ~hand
    for c in FROZEN_CLASSES + HAND_CLASSES:
        obj &= class_indices != c
    return hand, obj


class DeformableTransformer(nn.Module):
    """Encoder + two-stage proposal machinery + decoder + shared heads.

    The class/keypoint head stacks live here because the decoder's iterative
    refinement is gated on them (the reference wires the same Modules into
    the decoder, actic_detr.py:147-149); outputs expose every per-layer head
    application so the DETR wrapper never re-runs them.
    """

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    two_stage: bool = True
    num_queries: int = 300
    num_classes: int = 14
    with_box_refine: bool = True
    two_stage_learn_xy: bool = True
    # DINO look-forward-twice (models/dino/deformable_transformer.py:810-817
    # with use_detached_boxes_dec_out=False): layer l's keypoint output is
    # based on the UNDETACHED updated ref from layer l-1, so the aux loss at
    # layer l also trains layer l-1's refinement head
    look_forward_twice: bool = False
    # faithful DINO transformer semantics (models/dino/deformable_transformer.py
    # with the DINO_4scale config defaults): learned tgt_embed content
    # queries, per-layer sine query-pos through a 2-layer MLP, ONE class head
    # + ONE key-MLP pair weight-tied across all decoder layers AND the
    # encoder output, per-dim proposal adds, a final decoder LayerNorm on
    # every intermediate, and detached+swapped interm keys (dino.py:376-378).
    # Numerically A/B'd against the reference in tests/test_reference_parity.py.
    dino_variant: bool = False
    # Lite-DETR-style interleaved encoder update (arXiv:2303.07335), OFF by
    # default (changes semantics vs the reference): most encoder layers
    # refine only the low-resolution tokens (levels 1.., the trailing
    # S - H0*W0 of the level-concatenated sequence — a contiguous static
    # slice, no gathers); the full set incl. the ~75% level-0 tokens is
    # refined every `enc_lite_hi_every`-th layer and always in the last
    # layer (so two-stage proposals see a fully-updated memory). Low-res
    # queries still SAMPLE from the full, partially-updated sequence every
    # layer. Encoder MSDA+FFN cost on lo-only layers drops to ~25%.
    enc_lite: bool = False
    enc_lite_hi_every: int = 3
    compute_dtype: 'jnp.dtype' = jnp.float32
    # rematerialize encoder/decoder layers in the backward pass: drops every
    # layer's activations + the MSDA VJP residual layouts from HBM at the
    # cost of re-running each layer's forward during backprop. Enables large
    # batches (B=32 OOMs the device without it) — `jax.checkpoint` is the
    # TPU-native answer to the reference's torch.utils.checkpoint option
    # (swin_transformer.py:12,327)
    remat: bool = False

    def setup(self):
        enc_cls, dec_cls = EncoderLayer, DecoderLayer
        if self.remat:
            # static argnums: (self, src, pos, ref, spatial_shapes, mask,
            # train) — spatial_shapes (4? no: 0 is self) and train are
            # non-array python values
            enc_cls = nn.remat(EncoderLayer, static_argnums=(4, 6))
            dec_cls = nn.remat(DecoderLayer, static_argnums=(5, 7))
        self.enc_layers = [
            enc_cls(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.n_heads, self.enc_n_points,
                compute_dtype=self.compute_dtype,
                name=f"encoder_layer{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.dec_layers = [
            dec_cls(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_feature_levels, self.n_heads, self.dec_n_points,
                compute_dtype=self.compute_dtype,
                name=f"decoder_layer{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, self.d_model)
        )
        num_pred = self.num_decoder_layers + 1 if self.two_stage else self.num_decoder_layers

        prior_prob = 0.01
        cls_bias = -math.log((1 - prior_prob) / prior_prob)
        if self.dino_variant:
            # decoder heads are weight-tied across layers
            # (dec_pred_{class,bbox}_embed_share=True, dino.py:174-181); the
            # ENCODER-output heads are separate deepcopies (DINO_4scale.py
            # two_stage_{class,bbox}_embed_share=False -> dino.py:215-224
            # copy.deepcopy branch). Key MLPs zero-init their last layer
            # (dino.py:155-158; the enc copies inherit the zero init).
            self.cls_head_shared = nn.Dense(
                self.num_classes,
                bias_init=nn.initializers.constant(cls_bias),
                name="cls_head_shared",
            )
            zero = nn.initializers.zeros
            self.key_head_shared = MLP(
                self.d_model, 42, 3, last_init=zero, name="key_head_shared")
            self.obj_key_head_shared = MLP(
                self.d_model, 42, 3, last_init=zero, name="obj_key_head_shared")
            self.cls_heads = self.key_heads = self.obj_key_heads = None
        elif self.with_box_refine:
            self.cls_heads = [
                nn.Dense(
                    self.num_classes,
                    bias_init=nn.initializers.constant(cls_bias),
                    name=f"cls_head{i}",
                )
                for i in range(num_pred)
            ]
            self.key_heads = [
                MLP(self.d_model, 42, 3, name=f"key_head{i}") for i in range(num_pred)
            ]
            self.obj_key_heads = [
                MLP(self.d_model, 42, 3, name=f"obj_key_head{i}") for i in range(num_pred)
            ]
        else:
            self.cls_head_shared = nn.Dense(
                self.num_classes,
                bias_init=nn.initializers.constant(cls_bias),
                name="cls_head_shared",
            )
            self.cls_heads = None
            self.key_heads = None
            self.obj_key_heads = None

        if self.two_stage:
            self.enc_output = nn.Dense(self.d_model, name="enc_output")
            self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
            if self.dino_variant:
                # learned content queries (embed_init_tgt=True) + per-layer
                # query-pos MLP + final decoder norm; no pos_trans machinery
                self.tgt_embed = self.param(
                    "tgt_embed", nn.initializers.normal(1.0),
                    (self.num_queries, self.d_model),
                )
                self.dino_ref_point_head = MLP(
                    self.d_model, self.d_model, 2, name="ref_point_head")
                self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
                # separate enc-output heads (transformer.enc_out_* deepcopies)
                self.enc_out_cls_head = nn.Dense(
                    self.num_classes,
                    bias_init=nn.initializers.constant(cls_bias),
                    name="enc_out_cls_head",
                )
                zero = nn.initializers.zeros
                self.enc_out_key_head = MLP(
                    self.d_model, 42, 3, last_init=zero, name="enc_out_key_head")
                self.enc_out_obj_key_head = MLP(
                    self.d_model, 42, 3, last_init=zero,
                    name="enc_out_obj_key_head")
            else:
                # compute_dtype like the FFN/attention matmuls: the
                # (Q, 42*128)x(5376, 1024) pair is ~2.5 ms/step of f32 MXU
                # time in the bf16 headline otherwise (PERF.md round 3)
                self.pos_trans1 = nn.Dense(
                    1024, dtype=self.compute_dtype, name="pos_trans1")
                self.pos_trans2 = nn.Dense(
                    1024, dtype=self.compute_dtype, name="pos_trans2")
                self.pos_trans3 = nn.Dense(
                    2 * self.d_model, dtype=self.compute_dtype,
                    name="pos_trans3")
                self.pos_trans_norm = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")
            if self.two_stage_learn_xy:
                # Embedding(1, 40), init logit(0.05) (arctic_transformer.py:88-89)
                self.learn_xy = self.param(
                    "two_stage_learn_xy",
                    nn.initializers.constant(math.log(0.05 / (1 - 0.05))),
                    (40,),
                )
        else:
            self.ref_point_head = nn.Dense(
                2, kernel_init=nn.initializers.xavier_uniform(), name="reference_points"
            )

    def _cls_head(self, i):
        if self.dino_variant or not self.with_box_refine:
            return self.cls_head_shared
        return self.cls_heads[i]

    def _key_head(self, i):
        return self.key_head_shared if self.dino_variant else self.key_heads[i]

    def _obj_key_head(self, i):
        return (self.obj_key_head_shared if self.dino_variant
                else self.obj_key_heads[i])

    def _gen_proposals(self, memory, padding_mask, spatial_shapes):
        """(memory', proposals) — gen_encoder_output_proposals (:106-142)."""
        B, S, _ = memory.shape
        props = []
        cur = 0
        for lvl, (H, W) in enumerate(spatial_shapes):
            m = padding_mask[:, cur : cur + H * W].reshape(B, H, W)
            valid_H = jnp.sum(~m[:, :, 0], 1).astype(jnp.float32)
            valid_W = jnp.sum(~m[:, 0, :], 1).astype(jnp.float32)
            gy, gx = jnp.meshgrid(
                jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
            )
            grid = jnp.stack([gx, gy], -1)[None]  # (1, H, W, 2)
            scale = jnp.stack([valid_W, valid_H], -1).reshape(B, 1, 1, 2)
            grid = (grid + 0.5) / scale  # (B, H, W, 2)
            if self.two_stage_learn_xy:
                # dino calls this two_stage_wh_embedding but hardcodes it ON
                # with the same logit(0.05) init (deformable_transformer.py:
                # 192,236,1118) — identical to arctic's two_stage_learn_xy
                xy = jnp.ones_like(grid).repeat(20, axis=-1) * jax.nn.sigmoid(self.learn_xy) * (2.0 ** lvl)
            else:
                xy = jnp.ones_like(grid).repeat(20, axis=-1) * 0.05 * (2.0 ** lvl)
            prop = jnp.concatenate([grid, xy], -1).reshape(B, H * W, 42)
            props.append(prop)
            cur += H * W
        proposals = jnp.concatenate(props, 1)  # (B, S, 42)
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1, keepdims=True)
        proposals = jnp.log(proposals / (1 - proposals))
        invalid = padding_mask[..., None] | ~valid
        proposals = jnp.where(invalid, INVALID_PROPOSAL, proposals)
        mem = jnp.where(padding_mask[..., None], 0.0, memory)
        mem = jnp.where(~valid, 0.0, mem)
        mem = self.enc_output_norm(self.enc_output(mem))
        return mem, proposals

    def __call__(
        self,
        srcs: Sequence[jnp.ndarray],  # L x (B, H_l, W_l, C)
        masks: Sequence[jnp.ndarray],  # L x (B, H_l, W_l) True=pad
        pos_embeds: Sequence[jnp.ndarray],  # L x (B, H_l, W_l, C)
        query_embed: Optional[jnp.ndarray] = None,  # (Q, 2C) non-two-stage
        train: bool = False,
        dn_tgt: Optional[jnp.ndarray] = None,  # (B, P, C) label-embed content
        dn_refs_unact: Optional[jnp.ndarray] = None,  # (B, P, 42)
        dn_attn_mask: Optional[jnp.ndarray] = None,  # (P+Q, P+Q) True=blocked
    ):
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        B = srcs[0].shape[0]

        src_flat = jnp.concatenate([s.reshape(B, -1, self.d_model) for s in srcs], 1)
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], 1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(B, -1, self.d_model) + self.level_embed[l][None, None]
                for l, p in enumerate(pos_embeds)
            ],
            1,
        )

        valid_ratios = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.sum(~m[:, 0, :], 1).astype(jnp.float32) / m.shape[2],
                        jnp.sum(~m[:, :, 0], 1).astype(jnp.float32) / m.shape[1],
                    ],
                    -1,
                )
                for m in masks
            ],
            1,
        )  # (B, L, 2) = (w, h)

        # ---- encoder ----
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        memory = src_flat
        n_hi = spatial_shapes[0][0] * spatial_shapes[0][1]  # level-0 tokens
        n_enc = len(self.enc_layers)
        for i, layer in enumerate(self.enc_layers):
            full = (not self.enc_lite
                    or (i + 1) % self.enc_lite_hi_every == 0
                    or i == n_enc - 1)
            if full:
                memory = layer(memory, pos_flat, enc_ref, spatial_shapes,
                               mask_flat, train)
            else:
                # refine only the low-res levels (contiguous tail slice);
                # they still sample from the FULL partially-updated sequence
                lo = layer(memory[:, n_hi:], pos_flat[:, n_hi:],
                           enc_ref[:, n_hi:], spatial_shapes, mask_flat,
                           train, memory)
                memory = jnp.concatenate([memory[:, :n_hi], lo], axis=1)

        # ---- decoder inputs ----
        enc_outputs = None
        if self.two_stage:
            out_mem, out_props = self._gen_proposals(memory, mask_flat, spatial_shapes)
            if self.dino_variant:
                enc_cls = self.enc_out_cls_head(out_mem)
                enc_hand = self.enc_out_key_head(out_mem)
                enc_obj = self.enc_out_obj_key_head(out_mem)
                # dino adds proposals PER-DIM: the non-root dims get the
                # 0.05*2^lvl spread constants (deformable_transformer.py:343-346)
                enc_hand = enc_hand + out_props
                enc_obj = enc_obj + out_props
            else:
                enc_cls = self._cls_head(self.num_decoder_layers)(out_mem)
                enc_hand = self._key_head(self.num_decoder_layers)(out_mem)
                enc_obj = self._obj_key_head(self.num_decoder_layers)(out_mem)
                # arctic adds the root x to even dims, y to odd (:198-201)
                enc_hand = enc_hand.at[..., 0::2].add(out_props[..., 0:1]).at[..., 1::2].add(out_props[..., 1:2])
                enc_obj = enc_obj.at[..., 0::2].add(out_props[..., 0:1]).at[..., 1::2].add(out_props[..., 1:2])

            topk = self.num_queries
            scores = jnp.max(enc_cls, -1)
            topk_idx = jax.lax.top_k(scores, topk)[1]  # (B, Q)
            take = lambda x: jnp.take_along_axis(x, topk_idx[..., None], axis=1)
            cls_idx = jnp.take_along_axis(jnp.argmax(enc_cls, -1), topk_idx, axis=1)
            hand_m, obj_m = _class_masks(cls_idx)

            obj_kp = jax.lax.stop_gradient(take(enc_obj))
            hand_kp = jax.lax.stop_gradient(take(enc_hand))
            ref_unact = jax.lax.stop_gradient(take(out_props))
            ref_unact = jnp.where(obj_m[..., None], obj_kp, ref_unact)
            ref_unact = jnp.where(hand_m[..., None], hand_kp, ref_unact)
            reference_points = jax.nn.sigmoid(ref_unact) * 2 - 1  # [-1, 1] quirk

            if self.dino_variant:
                # learned content queries; query_pos is computed PER LAYER
                # from the current refs in the decoder loop below
                tgt = jnp.tile(self.tgt_embed[None], (B, 1, 1))
                query_pos = None
                # interm outputs: logits from the UNDETACHED gathered memory
                # through the enc class head; keys are the DETACHED top-k
                # coords with the reference's hand/obj SWAP (dino.py:376-378)
                tgt_undetach = take(out_mem)
                enc_outputs = {
                    "pred_logits": self.enc_out_cls_head(tgt_undetach),
                    "pred_hand_key_unact": obj_kp,  # swap, bug-compatible
                    "pred_obj_key_unact": hand_kp,
                }
            else:
                # flatten (B, Q) for the MLP: the 3-D (B, Q, 5376) operand
                # gave the (x, 5376)x(5376, 1024) GEMM a B-strided M axis
                # (59 TF/s measured); 2-D operands keep M contiguous
                pe = proposal_pos_embed(ref_unact, dtype=self.compute_dtype)
                Bq = pe.shape[:2]
                pt = nn.relu(self.pos_trans1(pe.reshape(-1, pe.shape[-1])))
                pt = nn.relu(self.pos_trans2(pt))
                pt = nn.relu(self.pos_trans3(pt))
                pt = self.pos_trans_norm(pt).reshape(Bq + (-1,))
                query_pos, tgt = jnp.split(pt, 2, axis=-1)
                enc_outputs = {
                    "pred_logits": enc_cls,
                    "pred_hand_key_unact": enc_hand,
                    "pred_obj_key_unact": enc_obj,
                }
        else:
            query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
            query_pos = jnp.tile(query_pos[None], (B, 1, 1))
            tgt = jnp.tile(tgt[None], (B, 1, 1))
            reference_points = jax.nn.sigmoid(self.ref_point_head(query_pos))

        # ---- contrastive-denoising queries (DINO variant) ----
        num_dn = 0
        if dn_tgt is not None:
            num_dn = dn_tgt.shape[1]
            dn_refs = jax.nn.sigmoid(dn_refs_unact) * 2 - 1
            if query_pos is not None:  # non-dino path keeps a fixed query_pos
                dn_pos = nn.relu(self.pos_trans1(proposal_pos_embed(dn_refs_unact)))
                dn_pos = nn.relu(self.pos_trans2(dn_pos))
                dn_pos = nn.relu(self.pos_trans3(dn_pos))
                dn_pos = self.pos_trans_norm(dn_pos)[..., : self.d_model]
                query_pos = jnp.concatenate([dn_pos, query_pos], axis=1)
            tgt = jnp.concatenate([dn_tgt, tgt], axis=1)
            reference_points = jnp.concatenate([dn_refs, reference_points], axis=1)

        init_reference = reference_points

        # ---- decoder ----
        hs_list, refs_in_list, logits_list = [], [], []
        # undetached ref entering each layer (ref_points list in the DINO
        # decoder, deformable_transformer.py:723,817): same values as
        # refs_in_list but with gradient flowing into the previous layer's
        # refinement head — used when look_forward_twice
        refs_undet_list = [reference_points]
        output = tgt
        ref = reference_points
        refine = (self.with_box_refine or self.dino_variant) and self.two_stage
        for lid, layer in enumerate(self.dec_layers):
            if ref.shape[-1] == 42:
                ref_input = ref[:, :, None] * jnp.tile(valid_ratios, (1, 1, 21))[:, None]
            else:
                ref_input = ref[:, :, None] * valid_ratios[:, None]
            refs_in_list.append(ref)
            if self.dino_variant:
                # per-layer conditional query pos: sine embed of the level-0
                # ref input through a 2-layer MLP (TransformerDecoder.forward,
                # deformable_transformer.py:736-747)
                query_pos = self.dino_ref_point_head(
                    sine_embed_42(ref_input[:, :, 0, :]))
            output = layer(output, query_pos, ref_input, memory, spatial_shapes,
                           mask_flat, train, self_attn_mask=dn_attn_mask)
            # dino norms every intermediate output; the refinement heads
            # see the RAW layer output (TransformerDecoder.forward:790-819)
            hs_list.append(self.decoder_norm(output) if self.dino_variant
                           else output)

            logits = self._cls_head(lid)(output)
            logits_list.append(self._cls_head(lid)(hs_list[-1])
                               if self.dino_variant else logits)
            if refine:
                cls_idx = jnp.argmax(logits, -1)
                hand_m, obj_m = _class_masks(cls_idx)
                d_hand = self._key_head(lid)(output)
                d_obj = self._obj_key_head(lid)(output)
                delta = jnp.where(
                    hand_m[..., None], d_hand, jnp.where(obj_m[..., None], d_obj, 0.0)
                )
                new_ref = jax.nn.sigmoid(inverse_sigmoid(ref) + delta) * 2 - 1
                ref = jax.lax.stop_gradient(new_ref)
                refs_undet_list.append(new_ref)

        hs = jnp.stack(hs_list)  # (n_dec, B, Q, C)
        if self.look_forward_twice and refine:
            refs_in = jnp.stack(refs_undet_list[: self.num_decoder_layers])
        else:
            refs_in = jnp.stack(refs_in_list)  # ref at the input of each layer
        pred_logits = jnp.stack(logits_list)

        # per-layer keypoint outputs (actic_detr.py:282-295 / dino.py:329-340):
        # delta(hs_l) + inverse_sigmoid(ref input to layer l), then sigmoid*2-1
        if refine:
            hand_keys, obj_keys = [], []
            for lid in range(self.num_decoder_layers):
                base = inverse_sigmoid(refs_in[lid])
                hand_keys.append(jax.nn.sigmoid(self._key_head(lid)(hs[lid]) + base) * 2 - 1)
                obj_keys.append(jax.nn.sigmoid(self._obj_key_head(lid)(hs[lid]) + base) * 2 - 1)
            pred_hand_key = jnp.stack(hand_keys)
            pred_obj_key = jnp.stack(obj_keys)
        else:
            pred_hand_key = pred_obj_key = None

        return {
            "hs": hs,
            "init_reference": init_reference,
            "refs_in": refs_in,
            "pred_logits": pred_logits,
            "pred_hand_key": pred_hand_key,
            "pred_obj_key": pred_obj_key,
            "enc_outputs": enc_outputs,
            "memory": memory,
            "num_dn": num_dn,
        }
