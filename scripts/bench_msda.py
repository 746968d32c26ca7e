"""MSDA microbench on the real TPU: xla vs pallas impl, fwd and fwd+bwd.

Encoder self-attn shape: B=16, Lq=S=1045 (224^2 / strides 8..64), M=8, D=32,
L=4, P=4. Inputs vary per scan step (constant-input microbenches report ~0 on
this stack — PERF.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lq", type=int, default=1045)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", default="both", choices=["fwd", "grad", "both"])
    ap.add_argument("--local", action="store_true",
                    help="encoder-realistic sampling locs: per-query grid "
                         "reference points + small offsets (exercises the "
                         "chunked kernel's locality skip); default is "
                         "uniform-random locs (worst case, no skip)")
    args = ap.parse_args()

    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uvhand_tpu.ops.msda import ms_deform_attn

    shapes = ((28, 28), (14, 14), (7, 7), (4, 4))
    S = sum(h * w for h, w in shapes)
    B, M, D, L, P = args.batch, 8, 32, 4, 4
    Lq = args.lq
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, M, D)), dt)
    if args.local and Lq == S:
        # encoder layout: query q at level l / cell (r, c) has normalized
        # reference (c+.5)/W, (r+.5)/H; offsets ~ a few cells (trained scale)
        refs = []
        for h, w in shapes:
            rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            refs.append(np.stack([(cc.ravel() + 0.5) / w, (rr.ravel() + 0.5) / h], -1))
        refs = np.concatenate(refs)  # (S, 2)
        off = rng.normal(scale=0.03, size=(B, Lq, M, L, P, 2))
        loc = jnp.asarray(refs[None, :, None, None, None, :] + off, jnp.float32)
    else:
        loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), dt)
    attn = attn / attn.reshape(B, Lq, M, -1).sum(-1).reshape(B, Lq, M, 1, 1)

    impl = args.impl

    def fwd_step(carry, i):
        v = carry + 0.001 * i  # vary inputs each step
        out = ms_deform_attn(v, shapes, loc, attn, impl=impl)
        return carry, out.mean()

    def grad_step(carry, i):
        v = carry + 0.001 * i

        def loss(v, l, a):
            return ms_deform_attn(v, shapes, l, a, impl=impl).mean()

        g = jax.grad(loss, argnums=(0, 1, 2))(v, loc, attn)
        return carry, sum(x.mean().astype(jnp.float32) for x in g)

    def run(step, tag):
        @jax.jit
        def k(v):
            _, outs = jax.lax.scan(step, v, jnp.arange(args.steps))
            return outs

        outs = jax.block_until_ready(k(value))  # compile+warm
        assert np.isfinite(np.asarray(outs, np.float32)).all(), outs
        t0 = time.perf_counter()
        outs = jax.block_until_ready(k(value))
        dt_s = time.perf_counter() - t0
        print(f"{impl} {args.dtype} {tag}: {dt_s / args.steps * 1e3:.2f} ms/call")

    if args.mode in ("fwd", "both"):
        run(fwd_step, "fwd")
    if args.mode in ("grad", "both"):
        run(grad_step, "fwd+bwd")

    # numerics vs the xla impl (on this backend)
    if impl != "xla":
        a = ms_deform_attn(value, shapes, loc, attn, impl=impl)
        b = ms_deform_attn(value, shapes, loc, attn, impl="xla")
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"max |{impl} - xla| = {err:.2e}")


if __name__ == "__main__":
    main()
