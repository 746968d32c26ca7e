"""Contrastive denoising (CDN) queries for the DINO variant.

Capability parity with `prepare_for_cdn`
(`/root/reference/models/dino/dn_components.py:20-150`) and the DN loss
bookkeeping in `SetCriterion` (`models/dino/dino.py:617-676`), adapted to
UVHand's 42-d keypoint targets (noise proportional to |coordinate|, negative
group gets an extra unit of noise, labels flipped to random classes with
p = label_noise_ratio/2).

TPU-first: the reference sizes dn groups dynamically from the max GT count
per batch; here the target count is the static 3 slots (object/left/right),
so groups = dn_number // (2*3) is a compile-time constant and every tensor
is static. Invalid target slots ride along: they classify as background in
the dn focal CE (reference semantics — the whole pad participates) and are
excluded from the dn keypoint L1 (dn_valid).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import inverse_sigmoid

T_SLOTS = 3


class CdnConfig(NamedTuple):
    dn_number: int = 100  # config/DINO dn_number
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0

    @property
    def groups(self) -> int:
        """Group count follows the reference's dynamic sizing
        (dn_components.py:46-56): dn_number doubles, then (when >= 100)
        divides by 2*max-GT-count. Our GT count is the static 3 slots, so
        the whole expression is a compile-time constant."""
        n = self.dn_number * 2
        if n >= 100:
            n = n // (T_SLOTS * 2)
        return max(1, n)

    @property
    def pad_size(self) -> int:
        return 2 * self.groups * T_SLOTS


def prepare_cdn(
    rng: jax.Array,
    labels: jnp.ndarray,  # (B, T) int32, -1 pad
    keypoints: jnp.ndarray,  # (B, T, 42) in ~[0,1] target space
    target_valid: jnp.ndarray,  # (B, T) bool
    num_classes: int,
    cfg: CdnConfig,
) -> Dict[str, jnp.ndarray]:
    B, T = labels.shape
    G = cfg.groups
    P = cfg.pad_size  # 2*G*T: layout [G groups of (pos T, neg T)]

    lab = jnp.maximum(labels, 0)
    # tile over groups and pos/neg: (B, G, 2, T)
    known_labels = jnp.broadcast_to(lab[:, None, None, :], (B, G, 2, T))
    known_keys = jnp.broadcast_to(keypoints[:, None, None, :, :], (B, G, 2, T, 42))
    valid = jnp.broadcast_to(target_valid[:, None, None, :], (B, G, 2, T))

    r1, r2, r3, r4 = jax.random.split(rng, 4)
    # label flip noise
    flip = jax.random.uniform(r1, known_labels.shape) < (cfg.label_noise_ratio * 0.5)
    rand_lab = jax.random.randint(r2, known_labels.shape, 0, num_classes)
    noised_labels = jnp.where(flip, rand_lab, known_labels)

    # keypoint noise: sign * U(0,1) (+1 for negatives) * |key| * scale
    sign = jax.random.randint(r3, known_keys.shape, 0, 2).astype(jnp.float32) * 2 - 1
    part = jax.random.uniform(r4, known_keys.shape)
    is_neg = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 1].set(1.0)
    part = part + is_neg
    noised_keys = jnp.clip(
        known_keys + sign * part * known_keys * cfg.box_noise_scale, 0.0, 1.0
    )

    return {
        "dn_labels_noised": noised_labels.reshape(B, P),
        "dn_keys_unact": inverse_sigmoid(noised_keys.reshape(B, P, 42)),
        "dn_labels_gt": known_labels.reshape(B, P),
        "dn_keys_gt": known_keys.reshape(B, P, 42),
        "dn_valid": valid.reshape(B, P),
        "dn_is_negative": jnp.broadcast_to(
            jnp.zeros((1, G, 2, T)).at[:, :, 1].set(1.0), (B, G, 2, T)
        ).reshape(B, P).astype(bool),
    }


def cdn_attn_mask(num_queries: int, cfg: CdnConfig) -> jnp.ndarray:
    """(tgt, tgt) boolean mask, True = BLOCKED (dn_components.py:126-141):
    matching queries can't see dn; dn groups can't see each other."""
    P, G = cfg.pad_size, cfg.groups
    per = 2 * T_SLOTS
    size = P + num_queries
    m = np.zeros((size, size), bool)
    m[P:, :P] = True
    for g in range(G):
        s, e = g * per, (g + 1) * per
        m[s:e, :s] = True
        m[s:e, e:P] = True
    return jnp.asarray(m)


def dn_losses(
    dn_logits: jnp.ndarray,  # (L, B, P, C) per decoder layer
    dn_hand_key: jnp.ndarray,  # (L, B, P, 42)
    dn_obj_key: jnp.ndarray,  # (L, B, P, 42)
    dn: Dict[str, jnp.ndarray],
    num_boxes: jnp.ndarray,
    focal_alpha: float = 0.25,
) -> Dict[str, jnp.ndarray]:
    """Per-layer dn losses, suffixed `_dn` by the caller (dino.py:617-676).

    Positives regress to their GT keys and classify as their GT label;
    negatives classify as no-object. Invalid target slots (target_valid
    False) contribute background-class focal CE like every other
    non-positive slot — the reference runs sigmoid_focal_loss over the
    ENTIRE dn pad with non-known slots labelled background, it does not
    exclude them (round-4 advice) — and are excluded only from the
    keypoint L1 (pos requires dn_valid).

    EXACT reference normalization (round-4 dn-loss A/B,
    tests/test_reference_parity_loss.py::test_dn_loss_parity):
      - the dn focal CE divides by num_boxes * GROUPS (the criterion passes
        `num_boxes*scalar` to loss_labels, dino.py:660) then multiplies by
        the dn pad width;
      - hand/obj dn keypoint L1 are SEPARATE losses with separate matched
        counts (loss_boxes semantics), named loss_hand_keypoint_dn /
        loss_obj_keypoint_dn so the reference weight table applies.
    The previous version divided CE by num_boxes only and pooled hand+obj
    into one loss_key_dn — both real drifts from the reference.
    """
    L, B, P, C = dn_logits.shape
    groups = P // 6  # pad = groups * 2 * T_SLOTS
    valid = dn["dn_valid"]
    neg = dn["dn_is_negative"]
    pos = valid & ~neg

    target_classes = jnp.where(valid & ~neg, dn["dn_labels_gt"], C)
    onehot = jax.nn.one_hot(target_classes, C + 1)[..., :-1]  # (B, P, C)

    is_hand = (dn["dn_labels_gt"] == 12) | (dn["dn_labels_gt"] == 13)

    def per_layer(logits, hkey, okey):
        p = jax.nn.sigmoid(logits)
        ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        p_t = p * onehot + (1 - p) * (1 - onehot)
        loss = ce * (1 - p_t) ** 2
        a_t = focal_alpha * onehot + (1 - focal_alpha) * (1 - onehot)
        loss = a_t * loss
        l_ce = loss.mean(1).sum() / (num_boxes * groups) * P

        pos_hand = pos & is_hand
        pos_obj = pos & ~is_hand
        l1_hand = jnp.abs(hkey - dn["dn_keys_gt"]).sum(-1) * pos_hand
        l1_obj = jnp.abs(okey - dn["dn_keys_gt"]).sum(-1) * pos_obj
        l_hand = jnp.sum(l1_hand) / jnp.maximum(jnp.sum(pos_hand), 1) / 21.0
        l_obj = jnp.sum(l1_obj) / jnp.maximum(jnp.sum(pos_obj), 1) / 21.0
        return l_ce, l_hand, l_obj

    ce, hand, obj = jax.vmap(per_layer)(dn_logits, dn_hand_key, dn_obj_key)
    out = {}
    for l in range(L):
        sfx = "_dn" if l == L - 1 else f"_dn_{l}"
        out[f"loss_ce{sfx}"] = ce[l]
        out[f"loss_hand_keypoint{sfx}"] = hand[l]
        out[f"loss_obj_keypoint{sfx}"] = obj[l]
    return out
