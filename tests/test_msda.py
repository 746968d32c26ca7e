"""MSDA parity vs an independent torch grid_sample oracle.

The oracle implements the published deformable-attention spec (Zhu et al.,
Deformable DETR): per level, bilinear grid_sample (align_corners=False,
zeros padding) at grid 2*loc-1, weighted-sum with attention weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from uvhand_tpu.ops.msda import MSDeformAttn, ms_deform_attn

SHAPES = ((6, 4), (3, 2))
B, M, D, Lq, P = 1, 2, 2, 2, 2
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def torch_oracle(value, shapes, loc, attn):
    """value (B,S,M,D), loc (B,Lq,M,L,P,2), attn (B,Lq,M,L,P) -> (B,Lq,M*D)."""
    value = torch.as_tensor(value)
    loc = torch.as_tensor(loc)
    attn = torch.as_tensor(attn)
    Bt, St, Mt, Dt = value.shape
    Lqt = loc.shape[1]
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = vals[lid].flatten(2).transpose(1, 2).reshape(Bt * Mt, Dt, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)  # (B*M, D, Lq, P)
    a = attn.transpose(1, 2).reshape(Bt * Mt, 1, Lqt, len(shapes) * loc.shape[4])
    out = (torch.stack(sampled, dim=-2).flatten(-2) * a).sum(-1)
    return out.view(Bt, Mt * Dt, Lqt).transpose(1, 2).contiguous().numpy()


def make_inputs(rng, b=B, lq=Lq, m=M, d=D, p=P, shapes=SHAPES):
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.standard_normal((b, s, m, d)).astype(np.float32) * 0.01 + 0.05
    loc = rng.uniform(0, 1, size=(b, lq, m, l, p, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(b, lq, m, l, p)).astype(np.float32) + 1e-5
    attn /= attn.reshape(b, lq, m, -1).sum(-1, keepdims=True).reshape(b, lq, m, 1, 1)
    return value, loc, attn


def test_forward_matches_oracle(rng):
    value, loc, attn = make_inputs(rng)
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)))
    ref = torch_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_forward_larger_shapes(rng):
    shapes = ((28, 28), (14, 14), (7, 7), (4, 4))
    value, loc, attn = make_inputs(rng, b=2, lq=50, m=8, d=32, p=4, shapes=shapes)
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    ref = torch_oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_out_of_bounds_sampling_is_zero_padded(rng):
    value, loc, attn = make_inputs(rng)
    loc = loc * 4.0 - 2.0  # most samples far outside [0,1]
    ours = np.asarray(ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)))
    ref = torch_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gradients_match_oracle(rng):
    value, loc, attn = make_inputs(rng)
    g = rng.standard_normal((B, Lq, M * D)).astype(np.float32)

    def loss_jax(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) * jnp.asarray(g))

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.as_tensor(value, dtype=torch.float64).requires_grad_(True)
    tl = torch.as_tensor(loc, dtype=torch.float64).requires_grad_(True)
    ta = torch.as_tensor(attn, dtype=torch.float64).requires_grad_(True)

    # torch oracle graph in fp64
    splits = [h * w for h, w in SHAPES]
    vals = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (h, w) in enumerate(SHAPES):
        v = vals[lid].flatten(2).transpose(1, 2).reshape(B * M, D, h, w)
        gr = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, gr, mode="bilinear", padding_mode="zeros", align_corners=False))
    a = ta.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * a).sum(-1)
    out = out.view(B, M * D, Lq).transpose(1, 2)
    (out * torch.as_tensor(g, dtype=torch.float64)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4, atol=1e-5)
    # loc grads: exclude samples that sit exactly on pixel-cell boundaries
    # (floor discontinuity — subgradient choice may differ)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_module_forward_2d_and_42d_refs(rng):
    mod = MSDeformAttn(d_model=64, n_levels=L, n_heads=4, n_points=P)
    query = jnp.asarray(rng.standard_normal((2, 7, 64)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, S, 64)), jnp.float32)
    ref2 = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 7, L, 2)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), query, ref2, feats, SHAPES)
    out2 = mod.apply(params, query, ref2, feats, SHAPES)
    assert out2.shape == (2, 7, 64)

    ref42 = jnp.asarray(rng.uniform(0.2, 0.8, size=(2, 7, L, 42)), jnp.float32)
    out42 = mod.apply(params, query, ref42, feats, SHAPES)
    assert out42.shape == (2, 7, 64)

    # 42-d center-refine: constant keypoints == their mean == equivalent 2-d ref
    center = jnp.tile(ref2[..., :2], (1, 1, 1, 21))
    out_center = mod.apply(params, query, center, feats, SHAPES)
    np.testing.assert_allclose(np.asarray(out_center), np.asarray(out2), atol=1e-5)


def test_module_padding_mask(rng):
    mod = MSDeformAttn(d_model=32, n_levels=L, n_heads=4, n_points=P)
    query = jnp.asarray(rng.standard_normal((1, 3, 32)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((1, S, 32)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.3, 0.7, size=(1, 3, L, 2)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), query, ref, feats, SHAPES)
    mask_all = jnp.ones((1, S), bool)
    out = mod.apply(params, query, ref, feats, SHAPES, input_padding_mask=mask_all)
    # all values masked to zero -> output is only biases through projections
    out2 = mod.apply(params, query, ref, jnp.zeros_like(feats), SHAPES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    """The hand-written backward must equal plain autodiff of the xla_ad path."""
    value, loc, attn = make_inputs(rng)
    g = rng.standard_normal((B, Lq, M * D)).astype(np.float32)

    def loss(impl):
        def f(v, l, a):
            return jnp.sum(ms_deform_attn(v, SHAPES, l, a, impl=impl) * jnp.asarray(g))
        return f

    gv1, gl1, ga1 = jax.grad(loss("xla"), argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    gv2, gl2, ga2 = jax.grad(loss("xla_ad"), argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2), rtol=1e-3, atol=1e-5)


def test_bf16_compute_close_to_fp32(rng):
    value, loc, attn = make_inputs(rng, b=2, lq=20, m=4, d=32,
                                   shapes=((8, 8), (4, 4)))
    f32 = np.asarray(ms_deform_attn(jnp.asarray(value), ((8, 8), (4, 4)),
                                    jnp.asarray(loc), jnp.asarray(attn)))
    b16 = np.asarray(ms_deform_attn(
        jnp.asarray(value, jnp.bfloat16), ((8, 8), (4, 4)),
        jnp.asarray(loc), jnp.asarray(attn, jnp.bfloat16)).astype(jnp.float32))
    np.testing.assert_allclose(b16, f32, atol=3e-3)
