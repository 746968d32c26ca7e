"""Pallas MSDA kernel parity: vs torch grid_sample oracle and the XLA path.

On the CPU test mesh the kernel runs in Pallas interpret mode; the same code
compiles via Mosaic on TPU (verified separately on hardware).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uvhand_tpu.ops.msda import ms_deform_attn
from uvhand_tpu.ops.msda_pallas import ms_deform_attn_pallas

from test_msda import SHAPES, B, M, D, Lq, P, L, make_inputs, torch_oracle


def test_pallas_forward_matches_oracle(rng):
    value, loc, attn = make_inputs(rng)
    ours = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    )
    ref = torch_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pallas_forward_larger_shapes(rng):
    shapes = ((28, 28), (14, 14), (7, 7), (4, 4))
    value, loc, attn = make_inputs(rng, b=2, lq=150, m=8, d=32, p=4, shapes=shapes)
    ours = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))
    )
    ref = torch_oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pallas_out_of_bounds_zero_padded(rng):
    value, loc, attn = make_inputs(rng)
    loc = loc * 4.0 - 2.0
    ours = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    )
    ref = torch_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pallas_gradients_match_xla_path(rng):
    shapes = ((8, 8), (4, 4))
    value, loc, attn = make_inputs(rng, b=2, lq=37, m=4, d=16, p=3, shapes=shapes)
    g = rng.standard_normal((2, 37, 4 * 16)).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return jnp.sum(ms_deform_attn(v, shapes, l, a, impl=impl) * jnp.asarray(g))
        return f

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    gv1, gl1, ga1 = jax.grad(loss("xla"), argnums=(0, 1, 2))(*args)
    gv2, gl2, ga2 = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(np.asarray(gv2), np.asarray(gv1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga2), np.asarray(ga1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl2), np.asarray(gl1), rtol=1e-3, atol=1e-5)


def test_pallas_gradients_match_torch_oracle(rng):
    import torch
    import torch.nn.functional as F

    value, loc, attn = make_inputs(rng)
    g = rng.standard_normal((B, Lq, M * D)).astype(np.float32)

    def loss_jax(v, l, a):
        return jnp.sum(
            ms_deform_attn(v, SHAPES, l, a, impl="pallas") * jnp.asarray(g)
        )

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.as_tensor(value, dtype=torch.float64).requires_grad_(True)
    tl = torch.as_tensor(loc, dtype=torch.float64).requires_grad_(True)
    ta = torch.as_tensor(attn, dtype=torch.float64).requires_grad_(True)
    splits = [h * w for h, w in SHAPES]
    vals = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (h, w) in enumerate(SHAPES):
        v = vals[lid].flatten(2).transpose(1, 2).reshape(B * M, D, h, w)
        gr = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(
            F.grid_sample(v, gr, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    a = ta.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * a).sum(-1)
    out = out.view(B, M * D, Lq).transpose(1, 2)
    (out * torch.as_tensor(g, dtype=torch.float64)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_pallas_bf16(rng):
    shapes = ((8, 8), (4, 4))
    value, loc, attn = make_inputs(rng, b=2, lq=20, m=4, d=32, shapes=shapes)
    f32 = np.asarray(
        ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))
    )
    b16 = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value, jnp.bfloat16), shapes, jnp.asarray(loc),
            jnp.asarray(attn, jnp.bfloat16),
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(b16, f32, atol=3e-3)


def test_pallas_backward_variants_agree(rng, monkeypatch):
    """The three backward formulations — fully-factorized (production),
    separable-tent, and dense-reduction — must produce the same gradients.

    JAX memoizes the traced custom-VJP backward per (fn, avals), so the
    UVHAND_MSDA_FAC / UVHAND_MSDA_SEP_BWD knobs only take effect on a fresh
    trace — clear the tracing caches between runs (the knobs are likewise
    documented as set-before-first-use in production)."""
    from uvhand_tpu.ops import msda_pallas

    shapes = ((8, 8), (4, 4))
    value, loc, attn = make_inputs(rng, b=2, lq=37, m=4, d=16, p=3, shapes=shapes)
    g = rng.standard_normal((2, 37, 4 * 16)).astype(np.float32)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

    def grads(fac_env, sep_env):
        jax.clear_caches()
        msda_pallas._bwd_partitioned.cache_clear()
        msda_pallas._bwd_fac_partitioned.cache_clear()
        monkeypatch.setenv("UVHAND_MSDA_FAC", fac_env)
        monkeypatch.setenv("UVHAND_MSDA_SEP_BWD", sep_env)

        # fp32 routes to dense unless forced; make sure the knob actually
        # selects the kernel this run intends to exercise
        assert msda_pallas._separable_ok(shapes, jnp.float32) == (
            sep_env == "force"
        )

        def f(v, l, a):
            return jnp.sum(
                ms_deform_attn(v, shapes, l, a, impl="pallas") * jnp.asarray(g)
            )
        out = jax.grad(f, argnums=(0, 1, 2))(*args)
        # a fresh trace must have built exactly the requested kernel variant
        fac = fac_env == "1"
        assert msda_pallas._bwd_fac_partitioned.cache_info().currsize == int(fac)
        assert msda_pallas._bwd_partitioned.cache_info().currsize == int(not fac)
        return out

    # fp32 inputs route to the dense kernel by default (fp32 HIGHEST makes
    # the separable folds slow on the real chip) — "force" opts sep back in
    # so all three formulations are exercised.
    fac = grads("1", "force")
    sep = grads("0", "force")
    dense = grads("0", "0")
    # In fp32/HIGHEST mode the separable kernel's fold dots run a two-term
    # bf16 split (exact 0/1 right operands; ~2^-16 relative per element),
    # so sep-vs-others carries that quantization on dpy/dpx/daw; dense and
    # fac reduce exactly. Scale-relative bound, not elementwise-relative:
    # tent grads cross zero so near-zero entries have large rtol.
    for a, b in zip(fac, sep):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=3e-5 * scale)
    for a, b in zip(sep, dense):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=3e-5 * scale)


def test_pallas_large_level_falls_back_to_dense(rng):
    """A level wider than 128 exceeds the (Qt, 128) factor tile; the bwd
    must route to the dense-reduction kernel and stay oracle-correct."""
    from uvhand_tpu.ops import msda_pallas

    shapes = ((2, 130),)
    assert not msda_pallas._separable_ok(shapes)
    assert not msda_pallas._fac_ok(shapes, 8)
    value, loc, attn = make_inputs(rng, b=1, lq=9, m=2, d=8, p=2, shapes=shapes)
    g = rng.standard_normal((1, 9, 2 * 8)).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return jnp.sum(ms_deform_attn(v, shapes, l, a, impl=impl) * jnp.asarray(g))
        return f

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g1 = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d", [30, 71])
def test_pallas_odd_channels(rng, d):
    """Non-lane-aligned head dims (the reference gradchecks channels
    {30,32,64,71,...}, models/ops/test.py:63-89)."""
    shapes = ((6, 4), (3, 2))
    value, loc, attn = make_inputs(rng, b=2, lq=5, m=2, d=d, shapes=shapes)
    ours = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        impl="pallas"))
    ref = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        impl="xla"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    g = rng.standard_normal(ours.shape).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return jnp.sum(ms_deform_attn(v, shapes, l, a, impl=impl) * jnp.asarray(g))
        return f

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    g1 = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
