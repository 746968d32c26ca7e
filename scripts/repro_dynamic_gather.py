"""Probe: in-kernel gather along sublanes/lanes (tpu.dynamic_gather).

The Mosaic lowering supports exactly `jnp.take_along_axis(x, idx, axis=0|1)`
with x 2-D and idx.shape == x.shape (per-element indices). Rounds 1-2 this
crashed the axon remote Mosaic compiler (HTTP 500); re-probe on every
toolchain update — a working in-kernel gather changes the MSDA kernel cost
model from O(seg) to O(4) per sample point.

Measures gather throughput at MSDA-like shapes: (1408, 128) per call.
"""

import time

import numpy as np


def run(axis: int, R: int, C: int, steps: int = 50):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, v_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(v_ref[...], idx_ref[...], axis=axis)

    rng = np.random.default_rng(0)
    hi = R if axis == 0 else C
    idx = jnp.asarray(rng.integers(0, hi, (R, C)), jnp.int32)
    v = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    out = call(idx, v)
    ref = np.take_along_axis(np.asarray(v), np.asarray(idx), axis=axis)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"axis={axis} ({R}x{C}): max err {err:.2e}")
    assert err == 0.0

    # throughput: vary idx per step so nothing constant-folds
    def step(carry, i):
        idx_i = (idx + i) % hi
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
    print(
        f"axis={axis}: {per * 1e6:.1f} us/call, "
        f"{R * C / per / 1e9:.2f} Gelem/s"
    )


def main():
    for axis in (0, 1):
        try:
            run(axis, 1408, 128)
        except Exception as e:
            print(f"axis={axis} FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
