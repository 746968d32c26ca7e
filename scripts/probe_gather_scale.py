"""Probe 2: lane-axis dynamic_gather at MSDA-relevant shapes.

Questions:
  1. does axis=1 gather work when C > 128 (cross-lane-tile indices)?
  2. real throughput at scale (grid over many blocks, G-sized gathers)?
"""

import time

import numpy as np


def run(R, C, grid_b=1, steps=20):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, v_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(
            v_ref[0], idx_ref[0], axis=1
        )[None]

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, C, (grid_b, R, C)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((grid_b, R, C)), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_b, R, C), jnp.float32),
    )

    out = call(idx, v)
    ref = np.take_along_axis(np.asarray(v), np.asarray(idx), axis=2)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err == 0.0, f"err={err}"

    def step(carry, i):
        idx_i = (idx + i) % C
        return carry, call(idx_i, v).sum()

    @jax.jit
    def k(v):
        _, outs = jax.lax.scan(step, v, jnp.arange(steps))
        return outs

    jax.block_until_ready(k(v))
    t0 = time.perf_counter()
    jax.block_until_ready(k(v))
    dt = time.perf_counter() - t0
    per = dt / steps
    n = grid_b * R * C
    print(f"({grid_b}x{R}x{C}): ok, {per * 1e3:.3f} ms/call, {n / per / 1e9:.2f} Gelem/s")


def main():
    for args in [
        (1048, 128, 8),      # within-tile, bigger
        (1048, 256, 1),      # cross-tile: does it even lower?
        (1048, 1408, 1),     # G-shaped (one bm block)
        (1048, 1408, 16),    # 16 bm blocks
        (8, 128, 128),       # many tiny blocks
    ]:
        try:
            run(*args)
        except Exception as e:
            print(f"{args} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
