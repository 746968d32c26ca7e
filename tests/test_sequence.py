import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.models.temporal.sequence import BiLSTM, TemporalAttention, TemporalParamHead


def test_bilstm_shapes_and_direction(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    m = BiLSTM(32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 8, 64)
    # forward half at t=0 must not depend on future frames
    x2 = x.at[:, 5:].add(10.0)
    y2 = m.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y[:, 0, :32]), np.asarray(y2[:, 0, :32]), atol=1e-6)
    assert np.abs(np.asarray(y[:, 0, 32:]) - np.asarray(y2[:, 0, 32:])).max() > 1e-4


def test_temporal_attention_window_pos(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    ta = TemporalAttention(64)
    p = ta.init(jax.random.PRNGKey(0), x)
    y = ta.apply(p, x)
    assert y.shape == x.shape
    # zero-init out_proj: the block contributes NOTHING at init, so the
    # residual TemporalParamHead starts as identity (a random perturbation
    # of the selected params spiked the camera losses; sequence.py note)
    assert np.abs(np.asarray(y)).max() == 0.0
    # with a live out_proj, attention mixes time: changing frame 7 changes
    # frame 0 output
    k = np.asarray(p["params"]["out_proj"]["kernel"])
    p["params"]["out_proj"]["kernel"] = jnp.asarray(
        rng.normal(size=k.shape) * 0.1, jnp.float32)
    y = ta.apply(p, x)
    y2 = ta.apply(p, x.at[:, 7].add(5.0))
    assert np.abs(np.asarray(y2[:, 0]) - np.asarray(y[:, 0])).max() > 1e-5


def test_temporal_param_head(rng):
    sel = {k: jnp.asarray(rng.normal(size=(16, d)), jnp.float32)
           for k, d in [("root.l", 3), ("root.r", 3), ("root.o", 3), ("pose.l", 48),
                        ("pose.r", 48), ("beta.l", 10), ("beta.r", 10), ("obj_rot", 3)]}
    sel["obj_rad"] = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    th = TemporalParamHead(window_size=8)
    p = th.init(jax.random.PRNGKey(0), sel)
    out = th.apply(p, sel)
    for k, v in sel.items():
        assert out[k].shape == v.shape
