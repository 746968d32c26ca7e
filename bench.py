"""Benchmark harness: flagship-model training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures K train steps chained inside ONE jitted `lax.scan`: in this
container the TPU is reached through a loopback relay that adds ~400 ms of
dispatch latency per program launch (device compute is ~143 ms/step at
B=16), so per-call walls measure the tunnel, not the chip. A production
local host pipelines async dispatch, which the scan emulates faithfully.

The reference publishes no throughput numbers (BASELINE.md). `vs_baseline`
is computed against REFERENCE_FPS_ESTIMATE: a documented estimate of the
CUDA reference's single-A100 train throughput for arctic_sf (R50, 224x224,
deformable-DETR 6+6, batch 16): ~140 frames/s. Replace with a measured
number when a CUDA reference run is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 140.0  # frames/s per A100, train step (see docstring)
BATCH = int(__import__("os").environ.get("UVHAND_BENCH_BATCH", 16))
# bf16 is the TPU-native default; UVHAND_BENCH_DTYPE=float32 measures the
# reference-parity mode (force-fp32 MSDA value path) — both are recorded in
# PERF.md per round
DTYPE = __import__("os").environ.get("UVHAND_BENCH_DTYPE", "bfloat16")
SCAN_STEPS = 20


def main():
    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    # rbg PRNG: threefry bit-gen for dropout/feature-mask costs ~50% of a
    # v5e train step (measured 1175 -> 582 ms); rbg is the TPU-native choice
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.losses.criterion import arctic_criterion
    from uvhand_tpu.train.state import create_train_state
    from __graft_entry__ import _tiny_targets

    model = UVHandDETR(compute_dtype=jnp.dtype(DTYPE))  # full arctic_sf config
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 224, 224, 3)), jnp.float32
    )
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs[:1])
    state = create_train_state(model, params, lr=2e-4)

    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets = _tiny_targets(BATCH)

    def loss_fn(p, rng):
        outputs = model.apply(
            {"params": p}, imgs, train=True,
            rngs={"dropout": rng, "feature_mask": jax.random.fold_in(rng, 1)},
        )
        total, _ = arctic_criterion(outputs, targets, mano_r, mano_l, bank)
        return total

    def one_step(carry, i):
        st, rng = carry
        step_rng = jax.random.fold_in(rng, i)
        total, grads = jax.value_and_grad(loss_fn)(st.params, step_rng)
        return (st.apply_gradients(grads=grads), rng), total

    @jax.jit
    def run_k(st, rng):
        (st, _), totals = jax.lax.scan(one_step, (st, rng), jnp.arange(SCAN_STEPS))
        return st, totals

    rng = jax.random.PRNGKey(0)
    state, totals = run_k(state, rng)  # compile + warmup
    jax.block_until_ready(totals)
    assert np.isfinite(np.asarray(totals)).all()

    t0 = time.perf_counter()
    state, totals = run_k(state, rng)
    jax.block_until_ready(totals)
    dt = time.perf_counter() - t0

    fps = BATCH * SCAN_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
