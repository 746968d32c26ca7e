"""Golden regression values: catch silent numeric drift across refactors.

Values captured at round 1 (jax 0.9, CPU, seed-fixed synthetic fixtures).
Tolerances are loose enough to survive benign op-order changes but tight
enough to catch semantic regressions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.geometry import aik, mano, objects
from uvhand_tpu.losses import criterion as crit
from test_criterion import make_targets, perfect_outputs


def test_golden_mano_forward():
    m = mano.synthetic_mano(0)
    v, j = mano.mano_forward(
        m, jnp.full((1, 3), 0.1), jnp.full((1, 45), 0.05), jnp.full((1, 10), 0.2),
        flat_hand_mean=True,
    )
    assert abs(float(jnp.sum(v)) - 20.841469) < 2e-2, float(jnp.sum(v))
    assert abs(float(jnp.sum(j)) - 0.412313) < 2e-3, float(jnp.sum(j))


def test_golden_criterion_total():
    rng = np.random.default_rng(3)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    outputs = perfect_outputs(gtp)
    total, _ = crit.arctic_criterion(outputs, targets, mano_r, mano_l, bank)
    # perfect params -> total = ce + keypoint + v3d_smoothing terms only
    assert abs(float(total) - 19.964) < 0.5, float(total)


def test_golden_aik():
    P = jnp.asarray(aik.TEMPLATE_RIGHT)[None] + 5.0  # translation-invariant? no: root-aligned assumption
    pose = aik.adaptive_ik(jnp.asarray(aik.TEMPLATE_RIGHT)[None])
    # identity template -> global orient ~0, locals ~0
    assert float(jnp.abs(pose).max()) < 1e-2
