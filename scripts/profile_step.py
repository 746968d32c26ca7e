"""Profile the bench train step on the real TPU and print an HLO-op
self-time breakdown (xprof hlo_stats), so optimization targets are measured,
not guessed."""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(logdir, batch, steps, bf16=True, enc_lite=False):
    """Profile the PRODUCTION program (same builder as bench.py/cli)."""
    import tempfile

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

    root = tempfile.mkdtemp(prefix="uvhand_prof_")
    bank = objects.synthetic_object_bank(2)
    arctic.make_synthetic_root(root, num_seqs=2, frames=(batch + 1) // 2, views=1,
                               obj_bank=bank)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(root, "p1", "train",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    b = next(iter(loader.DataLoader(ds, batch, shuffle=False, seed=0)))
    b = {k: jnp.asarray(v) for k, v in b.items()}

    model = UVHandDETR(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                       enc_lite=enc_lite)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 b["images"][:1])
    state = create_train_state(model, params, lr=2e-4)
    step = engine.make_fused_train_step(model, mano_r, mano_l, bank)

    rng = jax.random.PRNGKey(0)
    st, ld = step(state, b, rng)  # compile + warm
    jax.block_until_ready(ld["total"])

    t0 = time.perf_counter()
    for i in range(steps):
        st, ld = step(st, b, jax.random.fold_in(rng, i))
    jax.block_until_ready(ld["total"])
    wall = (time.perf_counter() - t0) / steps
    print(f"per-call wall (incl. relay): {wall*1e3:.1f} ms")

    with jax.profiler.trace(logdir):
        for i in range(steps):
            st, ld = step(st, b, jax.random.fold_in(rng, i))
        jax.block_until_ready(ld["total"])


def report(logdir, top=40):
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # hlo_stats returns JSON (gviz table); aggregate self-time by category+name
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    rows = [[c["v"] if c else None for c in r["c"]] for r in table["rows"]]
    i_name = cols.index("HLO op name") if "HLO op name" in cols else None
    i_text = cols.index("HLO op text") if "HLO op text" in cols else None
    print("columns:", cols)
    i_self = [i for i, c in enumerate(cols) if "self" in c.lower() and "time" in c.lower()]
    i_cat = [i for i, c in enumerate(cols) if "category" in c.lower()]
    i_frac = [i for i, c in enumerate(cols) if "%" in c or "fraction" in c.lower()]
    key = i_self[0] if i_self else 2
    rows.sort(key=lambda r: -(r[key] or 0))
    total = sum(r[key] or 0 for r in rows)
    print(f"total self time: {total:.0f} (us?)")
    agg = {}
    for r in rows:
        cat = r[i_cat[0]] if i_cat else "?"
        agg[cat] = agg.get(cat, 0) + (r[key] or 0)
    print("\n-- by category --")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{v/total*100:5.1f}%  {v:10.0f}  {k}")
    print("\n-- top ops --")
    for r in rows[:top]:
        nm = r[i_name] if i_name is not None else r[0]
        tx = (r[i_text] or "") if i_text is not None else ""
        cat = r[i_cat[0]] if i_cat else ""
        print(f"{(r[key] or 0)/total*100:5.1f}%  {r[key] or 0:10.0f}  {cat:20s} {str(nm)[:46]} {str(tx)[:60]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/prof_step")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--enc_lite", action="store_true")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        os.makedirs(args.logdir, exist_ok=True)
        capture(args.logdir, args.batch, args.steps, bf16=not args.fp32,
                enc_lite=args.enc_lite)
    report(args.logdir)
