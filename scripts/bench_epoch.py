"""Epoch throughput INCLUDING the host input pipeline.

`bench.py` measures the chip (synthetic resident tensors, scanned steps).
This script measures what a user sees: a disk-backed ARCTIC-layout dataset
(cv2 jpeg decode + crop/aug + GT assembly in DataLoader threads,
device_prefetch overlapping H2D with compute) driving the fused train step.

Usage: python scripts/bench_epoch.py [--frames 512] [--batch 16] [--bf16]
Prints one JSON line {"metric": "epoch_frames_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--workers_mode", default="thread",
                    choices=["thread", "process"])
    ap.add_argument("--host_only", action="store_true",
                    help="measure the host pipeline alone (no device step); "
                         "runs on any backend")
    ap.add_argument("--scan_workers", default="",
                    help="comma list, e.g. 1,2,4,8: print a host-pipeline "
                         "throughput table over worker counts x both modes")
    ap.add_argument("--native", default="off", choices=["off", "on", "fast"],
                    help="C++ fused image pipeline (uvhand_tpu/native)")
    args = ap.parse_args()

    if args.scan_workers or args.host_only:
        # host-pipeline-only runs must not grab (or wait on) the TPU
        import jax

        jax.config.update("jax_platforms", "cpu")

    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic
    from uvhand_tpu.data.loader import DataLoader
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train.state import create_train_state

    root = tempfile.mkdtemp(prefix="arctic_bench_")
    # full-res cropped images so decode cost is realistic (840x600 jpegs)
    views = 2
    seqs = max(1, args.frames // (views * 64))
    bank = objects.synthetic_object_bank(2)
    arctic.make_synthetic_root(root, num_seqs=seqs, frames=64, views=views,
                               obj_bank=bank)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom),
                              native_images=args.native)
    n_frames = min(len(ds), args.frames)

    if args.scan_workers or args.host_only:
        # host pipeline alone: decode + aug + GT assembly + collate
        def host_fps(workers, mode):
            dl = DataLoader(ds, args.batch, seed=0, num_workers=workers,
                            workers_mode=mode)
            n_steps = n_frames // args.batch
            it = iter(dl)
            next(it)  # warm (page cache, pool spin-up)
            t0 = time.perf_counter()
            done = 1
            for b in it:
                done += 1
                if done >= n_steps:
                    break
            return (done - 1) * args.batch / (time.perf_counter() - t0)

        if args.scan_workers:
            rows = []
            for mode in ("thread", "process"):
                for w in [int(x) for x in args.scan_workers.split(",")]:
                    fps = host_fps(w, mode)
                    rows.append({"mode": mode, "workers": w,
                                 "host_frames_per_sec": round(fps, 2)})
                    print(json.dumps(rows[-1]))
        else:
            fps = host_fps(args.workers, args.workers_mode)
            print(json.dumps({
                "metric": "host_pipeline_frames_per_sec",
                "value": round(fps, 2), "unit": "frames/s",
                "workers": args.workers, "mode": args.workers_mode,
            }))
        return

    model = UVHandDETR(
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    imgs = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, imgs)
    state = create_train_state(model, params, lr=2e-4)
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)

    dl = DataLoader(ds, args.batch, seed=0, num_workers=args.workers,
                    workers_mode=args.workers_mode)
    n_steps = n_frames // args.batch

    # warmup: compile + one data pass
    state, _ = engine.train_one_epoch(
        state, step, dl, 0, jax.random.PRNGKey(0), max_steps=2, print_freq=100)

    t0 = time.perf_counter()
    state, stats = engine.train_one_epoch(
        state, step, dl, 1, jax.random.PRNGKey(1), max_steps=n_steps,
        print_freq=1000)
    dt = time.perf_counter() - t0
    fps = n_steps * args.batch / dt
    print(json.dumps({
        "metric": "epoch_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "steps": n_steps,
        "batch": args.batch,
        "note": "disk jpeg decode + aug + GT assembly + H2D + fused step",
    }))


if __name__ == "__main__":
    main()
