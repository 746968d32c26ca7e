"""UVHand DETR: backbone + deformable transformer + 7 output heads.

Capability parity with `DeformableDETR` (`/root/reference/models/actic_detr.py:38-362`):
  - input projections: per-level 1x1 conv + GroupNorm(32), plus an extra
    stride-2 3x3 level from the last backbone map (:74-99, :206-225),
  - training-time encoder masking: 30% multiplicative feature dropout with
    NO rescaling (`uniform_() > 0.3`, :197-203) — replicated exactly,
  - heads per decoder layer: class (in transformer), mano pose 48 / beta 10,
    hand cam 3, obj cam 3, obj rot 3, obj radian 1 (:62-68); the non-class
    heads share weights across layers (:155-160),
  - two-stage per-layer 42-d keypoint outputs and encoder interm outputs in
    [-1,1] via sigmoid*2-1 (:282-295, :334-342),
  - feature_type modes: 'origin' runs the backbone; 'global_fm'/'local_fm'
    consume precomputed multi-scale features (:227-242).

Output pytree uses the reference's key names so the criterion/eval stack maps
one-to-one.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnet import ResNet50, RESNET50_CHANNELS
from .posenc import LearnedPositionEncoding, sine_position_encoding
from .transformer import DeformableTransformer


class InputProj(nn.Module):
    """1x1 conv (or 3x3 stride-2 for the extra level) + GroupNorm(32)."""

    d_model: int
    extra_level: bool = False

    @nn.compact
    def __call__(self, x):
        if self.extra_level:
            x = nn.Conv(
                self.d_model, (3, 3), strides=2, padding=1,
                kernel_init=nn.initializers.xavier_uniform(), name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.d_model, (1, 1),
                kernel_init=nn.initializers.xavier_uniform(), name="conv",
            )(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)


class UVHandDETR(nn.Module):
    num_classes: int = 14
    num_queries: int = 300
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
    with_box_refine: bool = True
    aux_loss: bool = True
    backbone: str = "resnet50"
    feature_type: str = "origin"  # 'origin' | 'global_fm' | 'local_fm'
    feature_mask_ratio: float = 0.3
    # DINO contrastive denoising (models/dino/, dn_components.py)
    use_dn: bool = False
    # faithful DINO transformer semantics (tied heads, tgt_embed, per-layer
    # sine query pos, decoder norm, swapped/detached interm keys) — see
    # DeformableTransformer.dino_variant; A/B'd vs the reference dino model
    dino_variant: bool = False
    dn_number: int = 100
    dn_label_noise_ratio: float = 0.5
    dn_box_noise_scale: float = 1.0
    # DINO look-forward-twice refinement-gradient path (dino default)
    look_forward_twice: bool = False
    # 'sine' (default) | 'learned' (position_encoding.py learned variant)
    position_embedding: str = "sine"
    # bf16 transformer compute (params stay fp32); fp32 default == reference
    compute_dtype: 'jnp.dtype' = jnp.float32
    # rematerialize transformer layers in backprop (see DeformableTransformer)
    remat: bool = False
    # Lite-DETR-style interleaved encoder update (see DeformableTransformer
    # .enc_lite; arXiv:2303.07335) — serving/training speed flag, off by
    # default; checkpoints are weight-compatible either way
    enc_lite: bool = False
    enc_lite_hi_every: int = 3
    # space-to-depth stem conv rewrite (backbones/resnet.py::StemConv) —
    # same function of the same parameters, MXU-friendly shape; exact up to
    # conv summation order, so off by default HERE to keep goldens
    # decoder-pinned. The training CLI and bench intentionally default it ON
    # (--stem_s2d, cli/main.py) — that ~1 ulp drift is the production point.
    stem_s2d: bool = False
    # temporal sequence head over window frames: refines the LAST layer's
    # selected per-entity params across each temporal_window-frame window
    # (models/temporal/sequence.py). "lstm" = the arctic_lstm BiLSTM design
    # (/root/reference/arctic_tools/src/models/arctic_lstm/model.py:36-61),
    # "vivit" = TemporalAttention (BASELINE config-5 "ViViT temporal
    # encoder"). Train: the refined params get their own ARCTIC small-loss
    # terms (criterion `/temporal` keys); eval decodes from them.
    temporal_head: str = "none"  # 'none' | 'lstm' | 'vivit'
    temporal_window: int = 0

    def _posenc(self, mask):
        if self.position_embedding == "learned":
            return self.pos_embed_learned(mask)
        if self.dino_variant:
            # PositionEmbeddingSineHW, pe_temperatureH/W=20, no -0.5 shift
            return sine_position_encoding(
                mask, self.d_model // 2, temperature=20.0, center_shift=False)
        return sine_position_encoding(mask, self.d_model // 2)

    def setup(self):
        if self.feature_type == "origin":
            if self.backbone == "resnet50":
                self.backbone_net = ResNet50(dtype=self.compute_dtype,
                                             stem_s2d=self.stem_s2d,
                                             name="backbone")
                self.backbone_channels = RESNET50_CHANNELS
            elif self.backbone == "swin_L_384_22k":
                from .backbones.swin import SwinTransformer, SWIN_L_CHANNELS

                self.backbone_net = SwinTransformer.swin_l_384(
                    dtype=self.compute_dtype, name="backbone")
                self.backbone_channels = SWIN_L_CHANNELS
            elif self.backbone == "convnext_xlarge_22k":
                # DINO's ConvNeXt option (models/dino/backbone.py:206-207)
                from .backbones.convnext import ConvNeXt, CONVNEXT_XL_CHANNELS

                self.backbone_net = ConvNeXt.convnext_xl(
                    dtype=self.compute_dtype, name="backbone")
                self.backbone_channels = CONVNEXT_XL_CHANNELS
            else:
                raise ValueError(f"unknown backbone {self.backbone}")
            n_backbone = len(self.backbone_channels)
            projs = [
                InputProj(self.d_model, name=f"input_proj{i}") for i in range(n_backbone)
            ]
            for i in range(n_backbone, self.num_feature_levels):
                projs.append(InputProj(self.d_model, extra_level=True, name=f"input_proj{i}"))
            self.input_projs = projs
        else:
            # precomputed raw backbone features still need projection to
            # d_model (the stored dumps keep backbone channel counts)
            self.input_projs = [
                InputProj(self.d_model, name=f"input_proj{i}")
                for i in range(self.num_feature_levels)
            ]

        self.transformer = DeformableTransformer(
            d_model=self.d_model,
            n_heads=self.n_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            dec_n_points=self.dec_n_points,
            enc_n_points=self.enc_n_points,
            two_stage=self.two_stage,
            num_queries=self.num_queries,
            num_classes=self.num_classes,
            with_box_refine=self.with_box_refine,
            dino_variant=self.dino_variant,
            look_forward_twice=self.look_forward_twice,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            enc_lite=self.enc_lite,
            enc_lite_hi_every=self.enc_lite_hi_every,
            name="transformer",
        )
        if not self.two_stage:
            self.query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0), (self.num_queries, 2 * self.d_model)
            )

        if self.use_dn:
            self.label_enc = nn.Embed(
                self.num_classes + 1, self.d_model, name="label_enc"
            )

        if self.position_embedding == "learned":
            self.pos_embed_learned = LearnedPositionEncoding(
                num_pos_feats=self.d_model // 2, name="pos_embed"
            )

        if self.temporal_head != "none":
            from .temporal.sequence import TemporalParamHead

            assert self.temporal_head in ("lstm", "vivit"), self.temporal_head
            assert self.temporal_window > 1, "temporal_head needs temporal_window"
            self.temporal_param_head = TemporalParamHead(
                self.temporal_window, kind=self.temporal_head,
                name="temporal_param_head")

        xavier = nn.initializers.xavier_uniform()
        self.mano_pose_head = nn.Dense(48, kernel_init=xavier, name="mano_pose_head")
        self.mano_beta_head = nn.Dense(10, kernel_init=xavier, name="mano_beta_head")
        self.hand_cam_head = nn.Dense(3, kernel_init=xavier, name="hand_cam_head")
        self.obj_cam_head = nn.Dense(3, kernel_init=xavier, name="obj_cam_head")
        self.obj_rot_head = nn.Dense(3, kernel_init=xavier, name="obj_rot_head")
        self.obj_rad_head = nn.Dense(1, kernel_init=xavier, name="obj_rad_head")

    def _feature_mask(self, x, train):
        if not train or self.feature_mask_ratio <= 0:
            return x
        rng = self.make_rng("feature_mask")
        keep = jax.random.uniform(rng, x.shape) > self.feature_mask_ratio
        return x * keep  # reference applies no 1/keep rescale

    def __call__(
        self,
        images: jnp.ndarray | Sequence[jnp.ndarray],
        image_mask: Optional[jnp.ndarray] = None,  # (B, H, W) True=pad
        train: bool = False,
        return_backbone_features: bool = False,
        dn_targets: Optional[dict] = None,  # labels/keypoints/target_valid
    ):
        if self.feature_type == "origin":
            feats = self.backbone_net(images)
            if return_backbone_features:
                return feats
            B, H, W, _ = images.shape
            if image_mask is None:
                image_mask = jnp.zeros((B, H, W), bool)

            srcs, masks, poses = [], [], []
            for l, f in enumerate(feats):
                m = jax.image.resize(
                    image_mask.astype(jnp.float32), (B,) + f.shape[1:3], "nearest"
                ).astype(bool)
                srcs.append(self._feature_mask(self.input_projs[l](f), train))
                masks.append(m)
                poses.append(self._posenc(m))
            for l in range(len(feats), self.num_feature_levels):
                src = self.input_projs[l](feats[-1] if l == len(feats) else srcs[-1])
                m = jax.image.resize(
                    image_mask.astype(jnp.float32), (B,) + src.shape[1:3], "nearest"
                ).astype(bool)
                srcs.append(self._feature_mask(src, train))
                masks.append(m)
                poses.append(self._posenc(m))
        else:
            # precomputed multi-scale features: list of (B, H_l, W_l, C)
            srcs, masks, poses = [], [], []
            for l, f in enumerate(images):
                B = f.shape[0]
                m = jnp.zeros((B,) + f.shape[1:3], bool)
                srcs.append(self._feature_mask(self.input_projs[l](f), train))
                masks.append(m)
                poses.append(self._posenc(m))

        dn_meta = None
        dn_kwargs = {}
        if self.use_dn and train and dn_targets is not None:
            from .dn import CdnConfig, cdn_attn_mask, prepare_cdn

            cfg = CdnConfig(self.dn_number, self.dn_label_noise_ratio, self.dn_box_noise_scale)
            dn_meta = prepare_cdn(
                self.make_rng("dn"), dn_targets["labels"], dn_targets["keypoints"],
                dn_targets["target_valid"], self.num_classes, cfg,
            )
            dn_kwargs = {
                "dn_tgt": self.label_enc(dn_meta["dn_labels_noised"]),
                "dn_refs_unact": dn_meta["dn_keys_unact"],
                "dn_attn_mask": cdn_attn_mask(self.num_queries, cfg),
            }

        t_out = self.transformer(
            srcs, masks, poses,
            query_embed=None if self.two_stage else self.query_embed,
            train=train,
            **dn_kwargs,
        )

        hs = t_out["hs"]  # (n_dec, B, P+Q, C)
        num_dn = t_out["num_dn"]
        pose = self.mano_pose_head(hs)
        beta = self.mano_beta_head(hs)
        hand_cam = self.hand_cam_head(hs)
        obj_cam = self.obj_cam_head(hs)
        obj_rot = self.obj_rot_head(hs)
        obj_rad = self.obj_rad_head(hs)

        logits = t_out["pred_logits"].astype(jnp.float32)
        hand_key = t_out["pred_hand_key"]
        obj_key = t_out["pred_obj_key"]

        dn_out = None
        if num_dn > 0:
            # dn_post_process (dino.py:355-361): split dn part off every head
            dn_out = {
                "pred_logits": logits[:, :, :num_dn],
                "pred_hand_key": hand_key[:, :, :num_dn] if hand_key is not None else None,
                "pred_obj_key": obj_key[:, :, :num_dn] if obj_key is not None else None,
                "dn_meta": dn_meta,
            }
            logits = logits[:, :, num_dn:]
            if hand_key is not None:
                hand_key = hand_key[:, :, num_dn:]
                obj_key = obj_key[:, :, num_dn:]
            hs = hs[:, :, num_dn:]
            pose = pose[:, :, num_dn:]
            beta = beta[:, :, num_dn:]
            hand_cam = hand_cam[:, :, num_dn:]
            obj_cam = obj_cam[:, :, num_dn:]
            obj_rot = obj_rot[:, :, num_dn:]
            obj_rad = obj_rad[:, :, num_dn:]

        def layer_out(l):
            return {
                "pred_logits": logits[l],
                "pred_hand_key": hand_key[l] if hand_key is not None else None,
                "pred_obj_key": obj_key[l] if obj_key is not None else None,
                "pred_mano_params": [pose[l], beta[l]],
                "pred_obj_params": [obj_rad[l], obj_rot[l]],
                "pred_cams": [hand_cam[l], obj_cam[l]],
            }

        out = layer_out(self.num_decoder_layers - 1)
        if self.aux_loss:
            out["aux_outputs"] = [layer_out(l) for l in range(self.num_decoder_layers - 1)]
        # stacked per-layer tensors: the criterion computes all layers' losses
        # in one vmapped pass (vs the reference's sequential per-aux loop)
        out["stacked"] = {
            "pred_logits": logits,
            "pred_hand_key": hand_key,
            "pred_obj_key": obj_key,
            "pred_mano_pose": pose,
            "pred_mano_beta": beta,
            "pred_hand_cam": hand_cam,
            "pred_obj_cam": obj_cam,
            "pred_obj_rot": obj_rot,
            "pred_obj_rad": obj_rad,
        }
        if self.two_stage and t_out["enc_outputs"] is not None:
            enc = t_out["enc_outputs"]
            out["interm_outputs"] = {
                "pred_logits": enc["pred_logits"],
                "pred_hand_key": jax.nn.sigmoid(enc["pred_hand_key_unact"]) * 2 - 1,
                "pred_obj_key": jax.nn.sigmoid(enc["pred_obj_key_unact"]) * 2 - 1,
            }
        if dn_out is not None:
            out["dn_outputs"] = dn_out
        if self.temporal_head != "none":
            # refine the last layer's selected per-entity params over the
            # window axis (rows are consecutive frames of flattened windows,
            # collate_windows/collate_tempo_train layout)
            from ..losses.criterion import select_queries

            last = {k: v[-1] for k, v in out["stacked"].items() if v is not None}
            out["temporal_selected"] = self.temporal_param_head(
                select_queries(last), train)
        return out
