"""Hungarian matching, fully on-device.

The reference syncs costs to the CPU and runs scipy linear_sum_assignment
every step (`/root/reference/models/matcher.py:120-123`) — a device->host
round-trip per train step. ARCTIC images have at most 3 targets (left hand,
right hand, object), so the assignment is solved exactly on-device with a
subset-DP over targets: O(Q * 2^T * T) — jit/vmap-safe, no host callback.

Cost construction mirrors ArcticMatcher (`matcher.py:45-125`): focal-style
class cost + L1 keypoint cost routed to the hand head for labels {12, 13}
and the object head otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


def hungarian_small(cost: jnp.ndarray, target_valid: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment for a (Q, T) cost matrix with small T.

    target_valid: (T,) bool; invalid targets are excluded (returned index -1).
    Returns assign: (T,) int32 — the query assigned to each target, -1 if the
    target is invalid.

    DP over queries with state = subset of targets already assigned. Exact
    because each query can serve at most one target and query order is
    irrelevant. Backtracks via stored per-(query, state) choices.
    """
    Q, T = cost.shape
    n_states = 1 << T
    # invalid targets cost 0 everywhere: they absorb an arbitrary spare query
    # without influencing the optimum for the valid ones.
    cost = jnp.where(target_valid[None, :], cost, 0.0)

    states = np.arange(n_states)
    # targets contained in each state
    contains = (states[:, None] >> np.arange(T)) & 1  # (S, T) 0/1
    prev_state = states[:, None] & ~(1 << np.arange(T))  # (S, T)

    contains = jnp.asarray(contains, bool)
    prev_state = jnp.asarray(prev_state, jnp.int32)

    def scan_fn(dp, q):
        # dp: (S,) best cost using queries < q
        cand = dp[prev_state] + cost[q][None, :]  # (S, T) assign target t to q
        cand = jnp.where(contains, cand, BIG)
        best_t = jnp.argmin(cand, axis=1)  # (S,)
        best_c = jnp.take_along_axis(cand, best_t[:, None], axis=1)[:, 0]
        new_dp = jnp.minimum(dp, best_c)
        used = best_c < dp  # whether query q is used for state S
        choice = jnp.where(used, best_t, -1).astype(jnp.int8)
        return new_dp, choice

    dp0 = jnp.full((n_states,), BIG, jnp.float32).at[0].set(0.0)
    _, choices = jax.lax.scan(scan_fn, dp0, jnp.arange(Q))  # choices: (Q, S)

    # backtrack from the full state through queries in reverse
    full = n_states - 1

    def back_fn(carry, q):
        state, assign = carry
        t = choices[q, state]
        used = t >= 0
        assign = jnp.where(
            used, assign.at[jnp.maximum(t, 0).astype(jnp.int32)].set(q), assign
        )
        state = jnp.where(
            used, state & ~(1 << jnp.maximum(t, 0).astype(jnp.int32)), state
        )
        return (state, assign), None

    init = (jnp.int32(full), jnp.full((T,), -1, jnp.int32))
    (state, assign), _ = jax.lax.scan(
        back_fn, init, jnp.arange(Q - 1, -1, -1)
    )
    return jnp.where(target_valid, assign, -1)


def arctic_match_costs(
    pred_logits: jnp.ndarray,  # (B, Q, C)
    pred_hand_key: jnp.ndarray | None,  # (B, Q, 42)
    pred_obj_key: jnp.ndarray | None,  # (B, Q, 42)
    tgt_labels: jnp.ndarray,  # (B, T) int32
    tgt_keypoints: jnp.ndarray | None,  # (B, T, 42)
    cost_class: float = 2.0,
    cost_keypoint: float = 5.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-image (Q, T) matching cost (matcher.py:92-117)."""
    prob = jax.nn.sigmoid(pred_logits)
    neg = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    lab = jnp.maximum(tgt_labels, 0)
    cls_cost = jnp.take_along_axis(pos - neg, lab[:, None, :], axis=2)  # (B,Q,T)

    C = cost_class * cls_cost
    if tgt_keypoints is not None and pred_hand_key is not None:
        is_hand = (tgt_labels == 12) | (tgt_labels == 13)  # (B, T)
        d_hand = jnp.sum(
            jnp.abs(pred_hand_key[:, :, None, :] - tgt_keypoints[:, None, :, :]), -1
        )
        d_obj = jnp.sum(
            jnp.abs(pred_obj_key[:, :, None, :] - tgt_keypoints[:, None, :, :]), -1
        )
        kp_cost = jnp.where(is_hand[:, None, :], d_hand, d_obj)
        C = C + cost_keypoint * kp_cost
    return C


@partial(jax.jit, static_argnames=("cost_class", "cost_keypoint"))
def arctic_match(
    pred_logits,
    pred_hand_key,
    pred_obj_key,
    tgt_labels,
    tgt_keypoints,
    target_valid,
    cost_class: float = 2.0,
    cost_keypoint: float = 5.0,
):
    """Batched matching. Returns assign (B, T): query per target or -1."""
    C = arctic_match_costs(
        pred_logits, pred_hand_key, pred_obj_key, tgt_labels, tgt_keypoints,
        cost_class, cost_keypoint,
    )
    return jax.vmap(hungarian_small)(C, target_valid)
