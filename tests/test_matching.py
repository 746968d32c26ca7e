import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from uvhand_tpu.losses.matching import hungarian_small, arctic_match


def test_hungarian_matches_scipy(rng):
    for trial in range(20):
        Q, T = 50, 3
        cost = rng.standard_normal((Q, T)).astype(np.float32) * 3
        assign = np.asarray(hungarian_small(jnp.asarray(cost), jnp.ones(T, bool)))
        ri, ci = linear_sum_assignment(cost.T)  # rows=targets
        expected = np.empty(T, np.int64)
        expected[ri] = ci
        ours_cost = cost[assign, np.arange(T)].sum()
        ref_cost = cost[expected, np.arange(T)].sum()
        assert len(set(assign.tolist())) == T  # distinct queries
        np.testing.assert_allclose(ours_cost, ref_cost, rtol=1e-5)


def test_hungarian_invalid_targets(rng):
    Q, T = 20, 3
    cost = rng.standard_normal((Q, T)).astype(np.float32)
    valid = jnp.asarray([True, False, True])
    assign = np.asarray(hungarian_small(jnp.asarray(cost), valid))
    assert assign[1] == -1
    sub = cost[:, [0, 2]]
    ri, ci = linear_sum_assignment(sub.T)
    ref_cost = sub[ci, np.arange(2)].sum()
    ours = cost[assign[[0, 2]], [0, 2]].sum()
    np.testing.assert_allclose(ours, ref_cost, rtol=1e-5)


def test_arctic_match_end_to_end(rng):
    B, Q, C, T = 2, 40, 14, 3
    logits = rng.standard_normal((B, Q, C)).astype(np.float32)
    hand_key = rng.uniform(-1, 1, (B, Q, 42)).astype(np.float32)
    obj_key = rng.uniform(-1, 1, (B, Q, 42)).astype(np.float32)
    labels = np.array([[12, 13, 3], [12, 13, 7]], np.int32)
    kps = rng.uniform(-1, 1, (B, T, 42)).astype(np.float32)
    valid = np.ones((B, T), bool)

    assign = np.asarray(
        arctic_match(
            jnp.asarray(logits), jnp.asarray(hand_key), jnp.asarray(obj_key),
            jnp.asarray(labels), jnp.asarray(kps), jnp.asarray(valid),
        )
    )
    # replicate reference cost on numpy and check optimality with scipy
    prob = 1 / (1 + np.exp(-logits))
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * prob**gamma * -np.log(1 - prob + 1e-8)
    pos = alpha * (1 - prob) ** gamma * -np.log(prob + 1e-8)
    for b in range(B):
        cls_cost = (pos - neg)[b][:, labels[b]]
        is_hand = (labels[b] == 12) | (labels[b] == 13)
        kp_cost = np.zeros((Q, T), np.float32)
        for t in range(T):
            src = hand_key[b] if is_hand[t] else obj_key[b]
            kp_cost[:, t] = np.abs(src - kps[b, t]).sum(-1)
        Cmat = 2.0 * cls_cost + 5.0 * kp_cost
        ri, ci = linear_sum_assignment(Cmat.T)
        ref_cost = Cmat[ci, np.arange(T)].sum()
        ours_cost = Cmat[assign[b], np.arange(T)].sum()
        np.testing.assert_allclose(ours_cost, ref_cost, rtol=1e-5)
