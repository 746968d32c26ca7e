"""MSDA backward-kernel ablation bench (round 3).

The bwd kernel measures 9.05 ms/enc-layer in-context vs a ~2.5 ms ALU floor
(PERF.md). This harness times stripped/restructured variants of the bwd
kernel body in isolation to locate where Mosaic burns the extra 3.6x:

  full      current production body (baseline)
  nodpy     dpy/dpx columns skipped (no sign/where chains)
  nodaw     daw columns skipped
  nodv      wsum accumulation + dV dot skipped
  onlyg     only the G_all dot (MXU floor for the plane)
  matred    per-point column reductions via MXU dot against ones
  signfree  sign-gate via float multiply instead of where(select)
  fused     single-pass restructure: shared hat subterms across outputs

Usage: python scripts/bench_msda_ablation.py [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(variant, spatial_shapes, dims, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from uvhand_tpu.ops import msda_pallas as mp

    B, S, M, D, Lq, P = dims
    L = len(spatial_shapes)
    LP = L * P
    sizes, seg, offs, S_pad = mp._level_plan(spatial_shapes)
    Qt = min(mp.Q_TILE, mp._round_up(Lq, 8))
    plan = tuple(zip(offs, seg))
    prec = mp._precision(dtype)

    # "xdot" family: G comes in as an INPUT (computed by an XLA batched
    # GEMM), the wsum plane goes OUT to HBM (dV = ws^T @ g as an XLA GEMM
    # afterwards) — the kernel body is pure VPU work.
    def kernel_xdot(matred, py_ref, px_ref, aw_ref, sy_ref, sx_ref, G_ref,
                    dpy_ref, dpx_ref, daw_ref, ws_ref):
        def red(x):
            if matred:
                return jax.lax.dot_general(
                    x, jnp.ones((x.shape[1], 8), jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, :1]
            return jnp.sum(x, axis=1, keepdims=True)

        dpy_cols, dpx_cols, daw_cols = [], [], []
        for l, (off, sg) in enumerate(plan):
            sy = sy_ref[:, off : off + sg]
            sx = sx_ref[:, off : off + sg]
            G = G_ref[0][:, off : off + sg].astype(jnp.float32)
            wsum = None
            for p in range(P):
                k = l * P + p
                py = py_ref[0, :, k : k + 1]
                px = px_ref[0, :, k : k + 1]
                aw = aw_ref[0, :, k : k + 1]
                dy = py - sy
                dx = px - sx
                ady = jnp.abs(dy)
                adx = jnp.abs(dx)
                wy = jnp.maximum(1.0 - ady, 0.0)
                wx = jnp.maximum(1.0 - adx, 0.0)
                wxG = wx * G
                wyG = wy * G
                daw_cols.append(red(wy * wxG))
                term = aw * (wy * wx)
                wsum = term if wsum is None else wsum + term
                ty = jnp.where(ady < 1.0, jnp.sign(dy), 0.0) * wxG
                tx = jnp.where(adx < 1.0, jnp.sign(dx), 0.0) * wyG
                dpy_cols.append(-aw * red(ty))
                dpx_cols.append(-aw * red(tx))
            ws_ref[0, :, off : off + sg] = wsum.astype(ws_ref.dtype)
        dpy_ref[0] = jnp.concatenate(dpy_cols, axis=1)
        dpx_ref[0] = jnp.concatenate(dpx_cols, axis=1)
        daw_ref[0] = jnp.concatenate(daw_cols, axis=1)

    def kernel(py_ref, px_ref, aw_ref, sy_ref, sx_ref, v_ref, g_ref,
               dv_ref, dpy_ref, dpx_ref, daw_ref, ws_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

        def red(x):
            return jnp.sum(x, axis=1, keepdims=True)

        if variant in ("matred", "eqred"):
            def red(x):  # noqa: F811 - MXU reduction
                return jax.lax.dot_general(
                    x, jnp.ones((x.shape[1], 8), jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, :1]

        g = g_ref[0]
        G_all = jax.lax.dot_general(
            g, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if variant == "onlyg":
            dpy_ref[0] = jnp.zeros(dpy_ref.shape[1:], dpy_ref.dtype)
            dpx_ref[0] = jnp.zeros(dpx_ref.shape[1:], dpx_ref.dtype)
            daw_ref[0] = G_all[:, :LP]
            ws_ref[...] = G_all.astype(ws_ref.dtype)
            dv_ref[0] += jax.lax.dot_general(
                ws_ref[...], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dv_ref.dtype)
            return

        dpy_cols, dpx_cols, daw_cols = [], [], []
        for l, (off, sg) in enumerate(plan):
            sy = sy_ref[:, off : off + sg]
            sx = sx_ref[:, off : off + sg]
            G = G_all[:, off : off + sg]
            wsum = None
            for p in range(P):
                k = l * P + p
                py = py_ref[0, :, k : k + 1]
                px = px_ref[0, :, k : k + 1]
                aw = aw_ref[0, :, k : k + 1]
                dy = py - sy
                dx = px - sx
                ady = jnp.abs(dy)
                adx = jnp.abs(dx)
                wy = jnp.maximum(1.0 - ady, 0.0)
                wx = jnp.maximum(1.0 - adx, 0.0)
                if variant == "fused":
                    hat = wy * wx
                    hatG = hat * G
                    daw_cols.append(red(hatG))
                    if variant != "nodv":
                        term = aw * hat
                        wsum = term if wsum is None else wsum + term
                    ty = jnp.where(ady < 1.0, jnp.sign(dy), 0.0) * (wx * G)
                    tx = jnp.where(adx < 1.0, jnp.sign(dx), 0.0) * (wy * G)
                    dpy_cols.append(-aw * red(ty))
                    dpx_cols.append(-aw * red(tx))
                    continue
                wxG = wx * G
                wyG = wy * G
                if variant != "nodaw":
                    daw_cols.append(red(wy * wxG))
                else:
                    daw_cols.append(aw)
                if variant != "nodv":
                    term = aw * (wy * wx)
                    wsum = term if wsum is None else wsum + term
                if variant == "nodpy":
                    dpy_cols.append(aw)
                    dpx_cols.append(aw)
                elif variant in ("eqgate", "eqred"):
                    # grid rows are INTEGERS: sign(dy)*[|dy|<1] ==
                    # [sy == floor(py)] - [sy == floor(py)+1] (exact for
                    # non-integer py; integer py hits measure-zero)
                    fy = jnp.floor(py)
                    fx = jnp.floor(px)
                    gy = (sy == fy).astype(jnp.float32) - (sy == fy + 1.0).astype(jnp.float32)
                    gx = (sx == fx).astype(jnp.float32) - (sx == fx + 1.0).astype(jnp.float32)
                    dpy_cols.append(-aw * red(gy * wxG))
                    dpx_cols.append(-aw * red(gx * wyG))
                elif variant == "signfree":
                    gy = jnp.sign(dy) * (ady < 1.0).astype(jnp.float32)
                    gx = jnp.sign(dx) * (adx < 1.0).astype(jnp.float32)
                    dpy_cols.append(-aw * red(gy * wxG))
                    dpx_cols.append(-aw * red(gx * wyG))
                else:
                    ty = jnp.where(ady < 1.0, jnp.sign(dy), 0.0) * wxG
                    tx = jnp.where(adx < 1.0, jnp.sign(dx), 0.0) * wyG
                    dpy_cols.append(-aw * red(ty))
                    dpx_cols.append(-aw * red(tx))
            if wsum is not None:
                ws_ref[:, off : off + sg] = wsum.astype(ws_ref.dtype)
            else:
                ws_ref[:, off : off + sg] = jnp.zeros((Qt, sg), ws_ref.dtype)
        dv_ref[0] += jax.lax.dot_general(
            ws_ref[...], g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dv_ref.dtype)
        dpy_ref[0] = jnp.concatenate(dpy_cols, axis=1)
        dpx_ref[0] = jnp.concatenate(dpx_cols, axis=1)
        daw_ref[0] = jnp.concatenate(daw_cols, axis=1)

    if variant in ("xdot", "xdotred"):
        import functools as ft

        def call(pyb, pxb, awb, vp, gb):
            Lq_pad = pyb.shape[1]
            sy_np, sx_np = mp._grid_maps(spatial_shapes)
            # XLA batched GEMM: G[bm, q, s] = sum_d g v (K=Qt-efficient side
            # handled by XLA's tiling, not a K=32 in-kernel dot)
            G = jax.lax.dot_general(
                gb, vp, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(vp.dtype)  # (BM, Lq_pad, S_pad)
            dpy, dpx, daw, ws = pl.pallas_call(
                ft.partial(kernel_xdot, variant == "xdotred"),
                grid=(B * M, Lq_pad // Qt),
                in_specs=[
                    mp._q_spec(Qt, LP), mp._q_spec(Qt, LP), mp._q_spec(Qt, LP),
                    mp._const_spec(S_pad), mp._const_spec(S_pad),
                    pl.BlockSpec((1, Qt, S_pad), lambda bm, q: (bm, q, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    mp._q_spec(Qt, LP), mp._q_spec(Qt, LP), mp._q_spec(Qt, LP),
                    pl.BlockSpec((1, Qt, S_pad), lambda bm, q: (bm, q, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
                    jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
                    jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
                    jax.ShapeDtypeStruct((B * M, Lq_pad, S_pad), vp.dtype),
                ),
                compiler_params=mp._COMPILER_PARAMS,
            )(pyb, pxb, awb, jnp.asarray(sy_np), jnp.asarray(sx_np), G)
            dv = jax.lax.dot_general(
                ws, gb, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (BM, S_pad, D)
            return dv, dpy, dpx, daw

        return call

    def call(pyb, pxb, awb, vp, gb):
        Lq_pad = pyb.shape[1]
        sy_np, sx_np = mp._grid_maps(spatial_shapes)
        return pl.pallas_call(
            kernel,
            grid=(B * M, Lq_pad // Qt),
            in_specs=[
                mp._q_spec(Qt, LP), mp._q_spec(Qt, LP), mp._q_spec(Qt, LP),
                mp._const_spec(S_pad), mp._const_spec(S_pad),
                mp._v_spec(S_pad, D),
                pl.BlockSpec((1, Qt, D), lambda bm, q: (bm, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, S_pad, D), lambda bm, q: (bm, 0, 0),
                             memory_space=pltpu.VMEM),
                mp._q_spec(Qt, LP), mp._q_spec(Qt, LP), mp._q_spec(Qt, LP),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B * M, S_pad, D), jnp.float32),
                jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
                jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
                jax.ShapeDtypeStruct((B * M, Lq_pad, LP), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((Qt, S_pad), vp.dtype)],
            compiler_params=mp._COMPILER_PARAMS,
        )(pyb, pxb, awb, jnp.asarray(sy_np), jnp.asarray(sx_np), vp, gb)

    return call


def main():
    variants = sys.argv[1:] or ["full", "onlyg", "nodpy", "nodaw", "nodv",
                                "matred", "signfree", "fused"]
    from uvhand_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from uvhand_tpu.ops import msda_pallas as mp

    shapes = ((28, 28), (14, 14), (7, 7), (4, 4))
    S = sum(h * w for h, w in shapes)
    B, M, D, L, P = 16, 8, 32, 4, 4
    Lq = S
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, M, D)), dt)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(0, 1, (B, Lq, M, L, P)), dt)
    g = jnp.asarray(rng.standard_normal((B, Lq, M * D)), dt)

    pyb, pxb, awb, vp = mp._layouts(shapes, value, loc, attn)
    gb = g.reshape(B, Lq, M, D).astype(vp.dtype)
    gb = jnp.transpose(gb, (0, 2, 1, 3)).reshape(B * M, Lq, D)
    Lq_pad = pyb.shape[1]
    gb = jnp.pad(gb, ((0, 0), (0, Lq_pad - Lq), (0, 0)))

    dims = (B, S, M, D, Lq, P)
    steps = 10
    for variant in variants:
        try:
            call = build(variant, shapes, dims, vp.dtype)

            def step(carry, i):
                outs = call(pyb + 0.0001 * i, pxb, awb, vp, gb)
                return carry, sum(o.astype(jnp.float32).mean() for o in outs)

            @jax.jit
            def k(c):
                _, outs = jax.lax.scan(step, c, jnp.arange(steps))
                return outs

            outs = jax.block_until_ready(k(jnp.zeros(())))
            assert np.isfinite(np.asarray(outs, np.float32)).all()
            t0 = time.perf_counter()
            jax.block_until_ready(k(jnp.zeros(())))
            dt_s = time.perf_counter() - t0
            print(f"{variant:10s}: {dt_s / steps * 1e3:7.2f} ms/call")
        except Exception as e:
            print(f"{variant:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
