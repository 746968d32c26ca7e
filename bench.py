"""Benchmark harness: flagship-model training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Round 3: measures the PRODUCTION program — `engine.make_fused_train_step`
(GT preprocessing incl. object FK, batched Kabsch, MANO FK and the camera
translation solve, then forward + criterion + AdamW), the same builder
`cli/main.py` trains with, on a raw batch from the disk-backed synthetic
ARCTIC pipeline. Round 2's bench skipped `process_targets`, measuring a
different (lighter) program than training (VERDICT r2 weak #3/#5).

Reports BOTH the bf16 headline and the fp32 reference-parity mode.

Measures K train steps chained inside ONE jitted `lax.scan`: in this
container the TPU is reached through a loopback relay that adds ~400 ms of
dispatch latency per program launch, so per-call walls measure the tunnel,
not the chip. A production local host pipelines async dispatch, which the
scan emulates faithfully.

The reference publishes no throughput numbers (BASELINE.md). `vs_baseline`
is computed against REFERENCE_FPS_ESTIMATE: a documented estimate of the
CUDA reference's single-A100 train throughput for arctic_sf (R50, 224x224,
deformable-DETR 6+6, batch 16): ~140 frames/s. Replace with a measured
number when a CUDA reference run is available.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 140.0  # frames/s per A100, train step (see docstring)
BATCH = int(os.environ.get("UVHAND_BENCH_BATCH", 16))
# UVHAND_BENCH_DTYPE=bfloat16|float32 measures one mode only; default both
DTYPE = os.environ.get("UVHAND_BENCH_DTYPE", "")
# 60 steps: the loopback relay charges ~180 ms per program LAUNCH (xprof
# shows the device 100% busy with tc_idle ~0.04 ms across the whole scan,
# so the wall-vs-device gap is all launch overhead). 20 steps left a ~9
# ms/step artifact on the reading; 60 amortizes it to ~3 ms. Device
# self-time per step is the tunnel-free number (UVHAND_BENCH_PROFILE).
SCAN_STEPS = int(os.environ.get("UVHAND_BENCH_SCAN", 60))


def measure(dtype_name: str, batch, world) -> float:
    import jax
    import jax.numpy as jnp

    from uvhand_tpu import engine
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train.state import create_train_state

    mano_r, mano_l, bank = world
    # layer remat auto-selected when the activation footprint would exceed
    # HBM (B=32 dies with a device error without it; PERF.md round 3)
    remat = os.environ.get("UVHAND_BENCH_REMAT", "")
    remat = (BATCH >= 24) if remat == "" else remat == "1"
    model = UVHandDETR(compute_dtype=jnp.dtype(dtype_name), remat=remat)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["images"][:1]
    )
    state = create_train_state(model, params, lr=2e-4)
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank, jit=False)

    def one_step(carry, i):
        st, rng = carry
        st, ld = step(st, batch, jax.random.fold_in(rng, i))
        return (st, rng), ld["total"]

    @jax.jit
    def run_k(st, rng):
        (st, _), totals = jax.lax.scan(one_step, (st, rng), jnp.arange(SCAN_STEPS))
        return st, totals

    rng = jax.random.PRNGKey(0)
    state, totals = run_k(state, rng)  # compile + warmup
    jax.block_until_ready(totals)
    assert np.isfinite(np.asarray(totals, np.float32)).all(), totals

    t0 = time.perf_counter()
    state, totals = run_k(state, rng)
    jax.block_until_ready(totals)
    dt = time.perf_counter() - t0

    # UVHAND_BENCH_PROFILE=<logdir>: capture an xprof trace of the same
    # cached scan program. Device self-time is stable across tunnel-speed
    # drift (~±5% on wall clock), so kernel A/Bs compare this, not fps.
    prof = os.environ.get("UVHAND_BENCH_PROFILE", "")
    if prof:
        import jax.profiler

        with jax.profiler.trace(os.path.join(prof, dtype_name)):
            state, totals = run_k(state, rng)
            jax.block_until_ready(totals)
    return BATCH * SCAN_STEPS / dt


def main():
    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    # rbg PRNG: threefry bit-gen for dropout/feature-mask costs ~50% of a
    # v5e train step (measured 1175 -> 582 ms); rbg is the TPU-native choice
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.geometry import mano, objects

    # raw batch from the disk pipeline (synthetic ARCTIC root)
    root = tempfile.mkdtemp(prefix="uvhand_bench_")
    arctic.make_synthetic_root(root, num_seqs=2, frames=(BATCH + 1) // 2, views=1)
    bank = objects.synthetic_object_bank(2)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    batch = next(iter(loader.DataLoader(ds, BATCH, shuffle=False, seed=0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    world = (mano.synthetic_mano(0, True), mano.synthetic_mano(1, False), bank)

    out = {"metric": "train_frames_per_sec_chip", "unit": "frames/s"}
    if DTYPE:
        fps = measure(DTYPE, batch, world)
        out["value"] = round(fps, 2)
        out["vs_baseline"] = round(fps / REFERENCE_FPS_ESTIMATE, 3)
        out["dtype"] = DTYPE
    else:
        bf16 = measure("bfloat16", batch, world)
        fp32 = measure("float32", batch, world)
        out["value"] = round(bf16, 2)
        out["vs_baseline"] = round(bf16 / REFERENCE_FPS_ESTIMATE, 3)
        out["fp32_value"] = round(fp32, 2)
        out["fp32_vs_baseline"] = round(fp32 / REFERENCE_FPS_ESTIMATE, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
