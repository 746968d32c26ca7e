"""AssemblyMatcher assignment A/B vs the reference's REAL matcher.

Runs `/root/reference/models/matcher.py::AssemblyMatcher.forward` (focal
classification cost at the target labels + 63-d keypoint L1, scipy
Hungarian) against `models/assembly.py::assembly_match` — the exact
function `assembly_criterion` matches with — on identical logits/keys/
targets, asserting identical assignments."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from uvhand_tpu.models.assembly import assembly_match

torch = pytest.importorskip("torch")

B, Q, C, T = 4, 12, 12, 3


def test_assembly_matcher_parity():
    import reference_stubs as rs

    ref = rs.import_reference_loss()
    matcher = ref.matcher.AssemblyMatcher(cost_class=2.0, cost_keypoint=5.0)

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    keys = rng.uniform(size=(B, Q, 63)).astype(np.float32)
    # AssemblyHands labels are nonzero (1/2 hands, 3.. objects) — the
    # reference's hand_idx mask (tgt_ids != 0) is then all-true
    labels = rng.integers(1, C, size=(B, T)).astype(np.int32)
    tgt_kp = rng.uniform(size=(B, T, 63)).astype(np.float32)

    with rs.torch_cuda_as_cpu(), torch.no_grad():
        out = {
            "pred_logits": torch.from_numpy(logits),
            "pred_keypoints": torch.from_numpy(keys),
        }
        targets = [
            {"labels": torch.from_numpy(labels[b]).long(),
             "keypoints": torch.from_numpy(tgt_kp[b])}
            for b in range(B)
        ]
        ref_idx = matcher(out, targets)

    ours = np.asarray(assembly_match(
        jnp.asarray(logits), jnp.asarray(keys), jnp.asarray(labels),
        jnp.asarray(tgt_kp), jnp.ones((B, T), bool)))

    for b in range(B):
        src, tgt = ref_idx[b][0].numpy(), ref_idx[b][1].numpy()
        # reference returns (query, target) pairs in arbitrary order;
        # ours returns per-target-slot query indices
        ref_by_slot = np.full(T, -1)
        ref_by_slot[tgt] = src
        np.testing.assert_array_equal(ours[b], ref_by_slot, f"image {b}")
