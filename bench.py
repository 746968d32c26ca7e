"""Benchmark harness: flagship-model training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md). `vs_baseline`
is computed against REFERENCE_FPS_ESTIMATE: a documented estimate of the
CUDA reference's single-A100 train throughput for arctic_sf (R50 backbone,
224x224, deformable-DETR 6+6, batch 16): Deformable-DETR trains COCO at
~3.4 it/s x bs2 on V100 at 800px; at 224px ARCTIC crops and A100-class HW,
~140 frames/s/GPU is a generous estimate. Replace with a measured number
when a CUDA reference run is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 140.0  # frames/s per A100, train step (see docstring)
BATCH = 16
STEPS = 20


def main():
    from uvhand_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    # rbg PRNG: threefry bit-gen for dropout/feature-mask costs ~50% of a
    # train step on v5e (measured 1175->582 ms); rbg is the TPU-native choice
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax
    import jax.numpy as jnp

    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train.state import create_train_state
    from uvhand_tpu.train.step import make_train_step
    from __graft_entry__ import _tiny_targets

    model = UVHandDETR()  # full arctic_sf config
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 224, 224, 3)), jnp.float32
    )
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs[:1])
    state = create_train_state(model, params, lr=2e-4)

    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    step = make_train_step(model, mano_r, mano_l, bank, donate=False)

    batch = {"images": imgs, "targets": _tiny_targets(BATCH)}
    rng = jax.random.PRNGKey(0)

    # warmup / compile
    state, ld = step(state, batch, rng)
    jax.block_until_ready(ld["total"])

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, ld = step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(ld["total"])
    dt = time.perf_counter() - t0

    fps = BATCH * STEPS / dt
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
