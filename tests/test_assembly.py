import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.models.assembly import AssemblyDETR, assembly_criterion
import pytest


@pytest.mark.slow
def test_assembly_forward_and_loss(rng):
    model = AssemblyDETR(num_classes=12, num_encoder_layers=1, num_decoder_layers=2,
                         d_model=64)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["pred_logits"].shape == (2, 3, 12)
    assert out["pred_keypoints"].shape == (2, 3, 63)
    assert len(out["aux_outputs"]) == 1

    labels = jnp.asarray([[9, 10, 3], [9, -1, 5]], jnp.int32)
    keys = jnp.asarray(rng.uniform(0, 1, (2, 3, 63)), jnp.float32)
    valid = jnp.asarray([[True, True, True], [True, False, True]])
    total, ld = assembly_criterion(out, labels, keys, valid)
    assert np.isfinite(float(total)) and float(total) > 0

    g = jax.grad(
        lambda p: assembly_criterion(model.apply(p, imgs), labels, keys, valid)[0]
    )(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0
