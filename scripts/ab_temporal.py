"""A/B capacity + held-out metric study: temporal heads vs the plain model.

Counterpart of `ab_enc_lite.py` for the temporal-head wiring (VERDICT r4
missing #2): window-temporal training (`TempoTrainDataset`, per-frame
targets) with `temporal_head` in {none, lstm, vivit}, same data / init seed
/ step count, comparing
  - total/term loss trajectories (capacity to drive the 18-term criterion), and
  - held-out metrics on a rendered-GT root (different seed) scored through
    the REAL eval stack (`engine.make_eval_step`) on window-ordered frames —
    the temporal heads refine params across each window, so the eval batches
    are WindowDataset-flattened like production arctic_lstm eval.

SmoothNet remains the separate post-hoc stage (train/smoothnet_driver.py has
its own noise-injection metrics); "none" here is the reference baseline the
heads must not lose to.

Usage: python scripts/ab_temporal.py [--window 8] [--chunks 12] [--batch 16]
Prints one JSON line per variant + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16,
                    help="frames per step (windows = batch // window)")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--scan", type=int, default=60)
    ap.add_argument("--variants", default="none,lstm,vivit")
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

    T = args.window
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)

    def window_batches(seed, n_batches):
        root = tempfile.mkdtemp(prefix=f"uvhand_abt_{seed}_")
        # one long sequence so windows are real consecutive-frame clips
        arctic.make_synthetic_root(root, num_seqs=1,
                                   frames=max(args.batch * n_batches, T + 22),
                                   views=1, seed=seed, obj_bank=bank,
                                   render_gt=True)
        ds = arctic.ArcticDataset(root, "p1", "train",
                                  kp3d_cano=np.asarray(bank.kp_bottom))
        tds = arctic.TempoTrainDataset(ds, T, split_window=True)
        dl = loader.DataLoader(
            tds, max(args.batch // T, 1), shuffle=False, seed=0,
            collate_fn=partial(arctic.collate_tempo_train, split_window=True))
        it = iter(dl)
        return [next(it) for _ in range(n_batches)]

    train_b = window_batches(0, 4)
    batch = {k: jnp.asarray(np.stack([b[k] for b in train_b]))
             for k in train_b[0]}
    eval_b = window_batches(1, 2)
    eval_batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in eval_b]

    TRACKED = ("total", "loss_ce", "loss/mano/kp2d/r", "loss/mano/kp3d/r",
               "loss/mano/pose/r", "loss/object/kp3d", "loss/object/rot",
               "loss/cd", "loss/mano/cam_t/r", "loss/object/transl",
               # the temporal head's own supervised camera terms — these are
               # where a bad refinement spikes (weak-persp scale near 0)
               "loss/mano/cam_t/r/temporal", "loss/object/transl/temporal")

    results = {}
    for name in args.variants.split(","):
        model = UVHandDETR(
            compute_dtype=jnp.bfloat16,
            temporal_head=name if name != "none" else "none",
            temporal_window=T if name != "none" else 0,
        )
        params = jax.jit(
            lambda r, im: engine.init_params(model, r, im)
        )(jax.random.PRNGKey(0), batch["images"][0, :1])
        state = create_train_state(model, params, lr=2e-4)
        step = engine.make_fused_train_step(model, mano_r, mano_l, bank,
                                            jit=False)

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
            state, curves = run_k(state, jax.random.fold_in(rng, c))
            curves = {k: np.asarray(jax.device_get(v), np.float32)
                      for k, v in curves.items()}
            assert all(np.isfinite(v).all() for v in curves.values()), (name, c)
            chunks.append(curves)
            print(f"  {name} chunk {c}: " +
                  " ".join(f"{k.split('/')[-1]}={v.mean():.4f}"
                           for k, v in curves.items()), flush=True)
        dt = time.perf_counter() - t0
        curve = {k: np.concatenate([ch[k] for ch in chunks]) for k in chunks[0]}
        row = {
            "last60_mean": {k: round(float(v[-args.scan:].mean()), 4)
                            for k, v in curve.items()},
            "steps": int(curve["total"].size),
            "wall_s": round(dt, 1),
        }

        eval_step = engine.make_eval_step(model, mano_r, mano_l, bank)
        rows = {}
        for eb in eval_batches:
            for k, v in eval_step(state.params, eb).items():
                rows.setdefault(k, []).append(np.asarray(v, np.float64))
        row["heldout_metrics"] = {
            k: round(float(np.nanmean(np.concatenate(v))), 3)
            for k, v in rows.items()}
        print(f"  {name} held-out: " + " ".join(
            f"{k}={v}" for k, v in row["heldout_metrics"].items()), flush=True)
        results[name] = row

    names = list(results)
    base = results[names[0]]
    summary = {"metric": "ab_temporal_heads", "window": T, "variants": names}
    for n in names[1:]:
        summary[f"last60_ratio_{n}_over_{names[0]}"] = {
            k: round(results[n]["last60_mean"][k]
                     / max(base["last60_mean"][k], 1e-9), 4)
            for k in base["last60_mean"]
        }
    summary.update(results)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
