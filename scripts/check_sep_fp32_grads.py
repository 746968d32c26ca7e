"""Gradient-accuracy check for the fp32 separable backward (HIGH fold dots).

The fp32 parity mode historically took the dense-reduction backward because
HIGHEST (6-pass) fold dots were slower than the VPU sums. With the fold dots
at HIGH (bf16x3), the separable kernel becomes the faster fp32 backward —
this script quantifies the gradient drift it introduces vs the dense kernel's
exact VPU reductions, on the real TPU.

Run twice (the kernel choice is locked at first trace):
    UVHAND_MSDA_SEP_BWD=0     python scripts/check_sep_fp32_grads.py /tmp/g_dense.npz
    UVHAND_MSDA_SEP_BWD=force python scripts/check_sep_fp32_grads.py /tmp/g_sep.npz
    python scripts/check_sep_fp32_grads.py --compare /tmp/g_dense.npz /tmp/g_sep.npz
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute(path):
    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uvhand_tpu.ops.msda import ms_deform_attn

    shapes = ((28, 28), (14, 14), (7, 7), (4, 4))
    S = sum(h * w for h, w in shapes)
    B, M, D, L, P = 4, 8, 32, 4, 4
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, (B, S, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, S, M, L, P)), jnp.float32)
    attn = attn / attn.reshape(B, S, M, -1).sum(-1).reshape(B, S, M, 1, 1)
    # a fixed cotangent (not mean) so every grad entry is exercised
    ct = jnp.asarray(rng.standard_normal((B, S, M * D)), jnp.float32)

    def loss(v, l, a):
        return (ms_deform_attn(v, shapes, l, a, impl="pallas") * ct).sum()

    gv, gl, ga = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, loc, attn)
    np.savez(path, gv=np.asarray(gv), gl=np.asarray(gl), ga=np.asarray(ga))
    print("saved", path, "backend:", jax.default_backend())


def compare(a_path, b_path):
    a, b = np.load(a_path), np.load(b_path)
    for k in ("gv", "gl", "ga"):
        x, y = a[k], b[k]
        denom = np.abs(x).max()
        print(f"{k}: max|d|={np.abs(x - y).max():.3e} "
              f"rel={np.abs(x - y).max() / denom:.3e} (scale {denom:.3e})")


if __name__ == "__main__":
    if sys.argv[1] == "--compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        compute(sys.argv[1])
