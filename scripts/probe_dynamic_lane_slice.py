"""Probe: can a Pallas TPU kernel slice a 16-lane window at a DYNAMIC lane
offset (program_id * 16) from a 128-lane operand?

Motivation (round-3 profile at 172 f/s): the MSDA call site pays ~2.5
ms/step of {1,0,2}->{2,1,0} relayout copies producing per-head
(B*M, Lq, 16) operands. If a kernel with grid axis m can consume the
NATURAL (B, Lq, M*LP=128) arrays and slice its head's 16 lanes in-kernel,
those copies disappear (block-spec per-head slicing is illegal — 16-lane
blocks — and an unrolled in-kernel M-loop blows the Mosaic compile;
PERF.md "All-heads kernel layouts"). This probes the third route.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    M, Q, W = 8, 1048, 16  # heads, queries, per-head lane window

    def kernel(x_ref, o_ref):
        m = pl.program_id(0)
        # dynamic-start lane slice: head m's 16-lane window
        win = x_ref[:, pl.dslice(m * W, W)]
        o_ref[...] = win * 2.0

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(M,),
            in_specs=[pl.BlockSpec((Q, M * W), lambda m: (0, 0))],
            out_specs=pl.BlockSpec((Q, W), lambda m: (m, 0)),
            out_shape=jax.ShapeDtypeStruct((M * Q, W), jnp.float32),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((Q, M * W)), jnp.float32)
    print("backend:", jax.default_backend())
    try:
        out = jax.block_until_ready(jax.jit(run)(x))
    except Exception as e:
        print("FAILED:", type(e).__name__, str(e)[:500])
        return
    want = (np.asarray(x).reshape(Q, M, W).transpose(1, 0, 2).reshape(M * Q, W)) * 2.0
    err = np.abs(np.asarray(out) - want).max()
    print("max err:", err)

    # timing: varying inputs, 50 calls in one scan
    @jax.jit
    def k50(x):
        def step(c, i):
            return c, run(c + 0.001 * i).sum()
        _, outs = jax.lax.scan(step, x, jnp.arange(50))
        return outs

    jax.block_until_ready(k50(x))
    t0 = time.perf_counter()
    jax.block_until_ready(k50(x))
    dt = (time.perf_counter() - t0) / 50
    print(f"{dt*1e6:.1f} us/call ({x.nbytes*2/dt/1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
