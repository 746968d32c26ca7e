"""Pallas MSDA kernel: dense hat-product formulation (gather-free).

The reference implements MSDA as CUDA scatter/gather kernels
(`/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238` forward +
6 col2im backward variants). Round 1's XLA formulation (ops/msda.py) is
correct but HBM-bound, and a direct in-kernel `take_along_axis` crashes this
toolchain's Mosaic compiler (`tpu.dynamic_gather`, PERF.md).

This kernel sidesteps gathers entirely. grid_sample's bilinear-with-zeros is
an inner product against a *dense* weight row that is almost all zeros:

    out[q] = sum_s W[q, s] * V[s]     with
    W[q, s] = sum_p attn[q,p] * relu(1 - |py[q,p] - sy[s]|)
                              * relu(1 - |px[q,p] - sx[s]|)

where (sy, sx) are each cell's integer pixel coordinates. The relu-hat is
exactly grid_sample's bilinear weight INCLUDING zero padding (out-of-range
corners get weight 0 automatically — no clamping, no masks). Per
(batch*head, query-tile): build W in VMEM with pure VPU ops, contract with
the value slab on the MXU. Value is read once (~17 MB vs ~1 GB of gather
traffic); W never touches HBM.

The per-level W planes are built DENSE over the full (lane-padded) level
segment. A chunked variant (128-lane K-chunks with an exact `pl.when`
locality skip on the tent's support band) was measured SLOWER — 7.4-9.7 ms
vs 4 ms per encoder-layer forward — chunk-loop/branch overhead and 11 small
dots lose more than the ~45% skipped hat work saves (PERF.md round-2
matrix). Straight-line dense code is the fast shape on this hardware.

The backward recomputes W per level (recompute-style VJP) and produces
    dV   = W^T @ g          (MXU, accumulated across query tiles)
    G    = g @ V^T          (MXU, per level)
    dattn[q,p] = sum_s hat_p[q,s] G[q,s]
    dpx/dpy    = attn * sum_s dhat * G
— no scatters anywhere, matching the CUDA backward's role with TPU idioms.
The forward's layout prep (transposes/pads) is passed through as VJP
residuals so the backward never re-runs it.

The dattn/dpy/dpx reductions use the SEPARABLE-TENT factorization (round-3
ablation `scripts/bench_msda_ablation.py`, 2.25x bwd speedup): the bilinear
hat factorizes as hat = wy(row) * wx(col), and within a level every token in
grid row r shares wy == ay[q, r]. So
    dattn[q,p] = sum_r ay[q,r] * Gx[q,r],   Gx = (wx*G) @ Kc
    dpy[q,p]   = -aw * sum_r sgn_y[q,r] * Gx[q,r]
    dpx[q,p]   = -aw * sum_c sgn_x[q,c] * Gy[q,c], Gy = (wy*G) @ Kr
where Kc/Kr are constant 0/1 fold maps (token -> row / token -> col) and the
folds run on the MXU. The sign/where chains and two of the three per-point
(Qt, seg)-wide reductions move from the (saturated) VPU onto (Qt, 128)
factors — requires every level dim <= 128 (true for all production strides;
larger grids fall back to the dense-reduction kernel).

Numerical contract: `ms_deform_attn_core_pytorch`
(`/root/reference/models/ops/functions/ms_deform_attn_func.py:42-62`).
fp32 inputs use HIGHEST matmul precision (parity mode); bf16 uses the MXU's
native path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG_ALIGN = 128  # per-level segment padding: lane alignment for W / dots
# query-tile sublanes: one tile covering the whole encoder (1048) measured
# best — fewer grid blocks; needs the raised VMEM limit below
Q_TILE = int(os.environ.get("UVHAND_MSDA_QTILE", 1048))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _level_plan(spatial_shapes: Tuple[Tuple[int, int], ...]):
    sizes = tuple(h * w for h, w in spatial_shapes)
    seg = tuple(_round_up(s, SEG_ALIGN) for s in sizes)
    offs = tuple(int(o) for o in np.cumsum((0,) + seg[:-1]))
    return sizes, seg, offs, int(sum(seg))


@functools.lru_cache(maxsize=None)
def _grid_maps(spatial_shapes: Tuple[Tuple[int, int], ...]):
    """(1, S_pad) per-cell pixel row/col maps; padding slots -1e6 => hat 0."""
    sizes, seg, offs, S_pad = _level_plan(spatial_shapes)
    sy = np.full((1, S_pad), -1e6, np.float32)
    sx = np.full((1, S_pad), -1e6, np.float32)
    for (h, w), sz, off in zip(spatial_shapes, sizes, offs):
        ar = np.arange(sz)
        sy[0, off : off + sz] = ar // w
        sx[0, off : off + sz] = ar % w
    return sy, sx


@functools.lru_cache(maxsize=None)
def _fold_maps(spatial_shapes: Tuple[Tuple[int, int], ...]):
    """(1, S_pad, 128) 0/1 fold maps for the separable backward: Kc folds a
    level's flattened (row, col) token axis over col (keeping row), Kr folds
    over row (keeping col). Padding slots stay all-zero so padded tokens
    never contribute; rows/cols beyond a level's extent likewise fold to 0,
    which reproduces grid_sample's zero padding exactly."""
    sizes, seg, offs, S_pad = _level_plan(spatial_shapes)
    Kc = np.zeros((1, S_pad, 128), np.float32)
    Kr = np.zeros((1, S_pad, 128), np.float32)
    for (h, w), sz, off in zip(spatial_shapes, sizes, offs):
        ar = np.arange(sz)
        Kc[0, off + ar, ar // w] = 1.0
        Kr[0, off + ar, ar % w] = 1.0
    return Kc, Kr


@functools.lru_cache(maxsize=None)
def _rowspace_plan(spatial_shapes: Tuple[Tuple[int, int], ...], D: int):
    """Lane plan for the fully-factorized kernels: each level's tokens are
    laid out as a (row, col*D) table; per-level lane blocks are padded to
    the 128-lane tile so in-kernel lane slicing stays aligned."""
    wd_sizes = tuple(_round_up(w * D, 128) for h, w in spatial_shapes)
    wd_offs = tuple(int(o) for o in np.cumsum((0,) + wd_sizes[:-1]))
    return wd_sizes, wd_offs, int(sum(wd_sizes)), max(8, D)


@functools.lru_cache(maxsize=None)
def _rowspace_maps(spatial_shapes: Tuple[Tuple[int, int], ...], D: int):
    """Constant 0/1 maps for the factorized kernels (all leading-dim-1 so
    the SPMD partitioner replicates them):
      E  (1, 128, WD): col-factor -> (c, d) lane expand
      F  (1, WD, 128): (c, d) -> d fold (forward output)
      Fc (1, WD, 128): (c, d) -> c fold (dpx)
      Tg (1, Dp, WD):  d -> (c, d) expand (for the incoming gradient)
    Lane slots past a level's real w*D stay all-zero, which reproduces
    grid_sample's zero padding exactly."""
    wd_sizes, wd_offs, WD, Dp = _rowspace_plan(spatial_shapes, D)
    E = np.zeros((1, 128, WD), np.float32)
    F = np.zeros((1, WD, 128), np.float32)
    Fc = np.zeros((1, WD, 128), np.float32)
    Tg = np.zeros((1, Dp, WD), np.float32)
    for (h, w), woff in zip(spatial_shapes, wd_offs):
        for c in range(w):
            E[0, c, woff + c * D : woff + (c + 1) * D] = 1.0
            Fc[0, woff + c * D : woff + (c + 1) * D, c] = 1.0
            dd = np.arange(D)
            F[0, woff + c * D + dd, dd] = 1.0
            Tg[0, dd, woff + c * D + dd] = 1.0
    return E, F, Fc, Tg


def _fac_ok(spatial_shapes, D) -> bool:
    # UVHAND_MSDA_FAC=1 opts into the fully-factorized kernels (like
    # UVHAND_MSDA_SEP_BWD it must be set before the first trace). Default
    # OFF: on the real chip they measure 33.0 ms fwd / 16.3 ms bwd vs the
    # production 5.7 / 9.2 (scripts/bench_msda_ablation.py, PERF.md round 3)
    # — the 128-row MXU expansion does ~64x the tent's true 2-row support,
    # and even its theoretical floor doesn't beat the separable kernels.
    if os.environ.get("UVHAND_MSDA_FAC", "0") != "1":
        return False
    wd_sizes, _, WD, _ = _rowspace_plan(spatial_shapes, D)
    return (
        all(h <= 128 and w <= 128 for h, w in spatial_shapes)
        and WD <= 4096
    )


def _separable_ok(spatial_shapes, dtype=jnp.bfloat16) -> bool:
    # UVHAND_MSDA_SEP_BWD=0 forces the dense-reduction backward (A/B knob).
    # Set it BEFORE the first backward trace: JAX memoizes the traced
    # custom-VJP bwd per (fn, avals), so a later flip only takes effect
    # after jax.clear_caches() + _bwd_partitioned.cache_clear().
    env = os.environ.get("UVHAND_MSDA_SEP_BWD", "1")
    if env == "0":
        return False
    if env != "force" and jnp.dtype(dtype) == jnp.float32:
        # fp32 parity mode runs every MXU dot at HIGHEST (6-pass) precision;
        # the separable kernel's 32 per-point fold dots then cost more than
        # the VPU reductions they replace: real-chip enc bwd 28.1 ms vs the
        # dense-reduction kernel's 13.2 (scripts/bench_msda_ablation.py
        # --fp32). bf16 keeps the separable kernel (9.2 vs 12.8).
        return False
    return all(h <= 128 and w <= 128 for h, w in spatial_shapes)


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


# big query tiles need more scoped VMEM than the 16M default (v5e has 128M);
# the fp32 path with the MXU-reduction backward peaks at ~112M scoped
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- kernels


def _fwd_kernel(plan, P, prec, vdt, py_ref, px_ref, aw_ref, sy_ref, sx_ref,
                v_ref, out_ref, w_ref):
    # build the full (Qt, S_pad) weight plane in VMEM scratch, then contract
    # with the whole value slab in ONE MXU dot (the per-level dot+accumulate
    # variant scheduled worse — same finding as the backward's K3 change)
    for l, (off, seg) in enumerate(plan):
        sy = sy_ref[:, off : off + seg]  # (1, seg)
        sx = sx_ref[:, off : off + seg]
        w = None
        for p in range(P):
            k = l * P + p
            py = py_ref[0, :, k : k + 1]  # (Qt, 1)
            px = px_ref[0, :, k : k + 1]
            aw = aw_ref[0, :, k : k + 1]
            hat = jnp.maximum(1.0 - jnp.abs(py - sy), 0.0) * jnp.maximum(
                1.0 - jnp.abs(px - sx), 0.0
            )  # (Qt, seg)
            term = aw * hat
            w = term if w is None else w + term
        w_ref[:, off : off + seg] = w.astype(w_ref.dtype)
    out_ref[0] = jnp.dot(
        w_ref[...], v_ref[0], preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def _bwd_kernel_sep(plan, P, prec, vdt, py_ref, px_ref, aw_ref, sy_ref,
                    sx_ref, kc_ref, kr_ref, v_ref, g_ref, dv_ref, dpy_ref,
                    dpx_ref, daw_ref, ws_ref):
    """Separable-tent backward (see module docstring). The wy/wx planes are
    still built dense (needed for wsum and the G products), but the three
    per-point (Qt, seg) reductions collapse to two MXU fold-dots plus tiny
    (Qt, 128)-wide factor ops, and the sign/where chains never touch a big
    plane."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    # Fold-dot precision: the 32 per-point fold dots are the kernel's MXU
    # bulk. fp32 parity mode pins dots to HIGHEST (6-pass), which made this
    # kernel 2x SLOWER than the dense-reduction one (28.1 vs 13.2 ms) and
    # forced fp32 onto the dense path. Every fold RIGHT operand here (Kc,
    # Kr, ones) is 0/1 — exact in bf16 — so a two-term bf16 split of the
    # left operand (hi = bf16(x), lo = bf16(x - hi)) recovers ~2^-16
    # relative accuracy in TWO default passes; Mosaic has no HIGH lowering
    # and HIGHEST's 6 passes buy nothing against an exact right operand.
    # These dots only feed the sampling-location/attention-weight
    # gradients; dvalue's G_all/dV dots stay at the caller's precision.
    hi2 = prec == jax.lax.Precision.HIGHEST

    def fold_dot(x, k):  # (Qt, seg) @ (seg, 128), k exactly bf16
        kb = k.astype(jnp.bfloat16) if hi2 else k

        def d(a):
            return jax.lax.dot_general(
                a, kb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT if hi2 else prec,
            )

        if not hi2:
            return d(x)
        xh = x.astype(jnp.bfloat16)
        return d(xh) + d((x - xh.astype(jnp.float32)).astype(jnp.bfloat16))

    def redsmall(x):  # (Qt, 128) -> (Qt, 1) on the MXU
        return fold_dot(x, jnp.ones((128, 8), jnp.float32))[:, :1]

    g = g_ref[0]  # (Qt, D)
    G_all = jax.lax.dot_general(
        g, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (Qt, S_pad)
    rc = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    dpy_cols, dpx_cols, daw_cols = [], [], []
    for l, (off, seg) in enumerate(plan):
        sy = sy_ref[:, off : off + seg]
        sx = sx_ref[:, off : off + seg]
        G = G_all[:, off : off + seg]
        kc = kc_ref[0, off : off + seg, :]
        kr = kr_ref[0, off : off + seg, :]
        wsum = None
        for p in range(P):
            k = l * P + p
            py = py_ref[0, :, k : k + 1]
            px = px_ref[0, :, k : k + 1]
            aw = aw_ref[0, :, k : k + 1]
            wy = jnp.maximum(1.0 - jnp.abs(py - sy), 0.0)
            wx = jnp.maximum(1.0 - jnp.abs(px - sx), 0.0)
            Gx = fold_dot(wx * G, kc)  # (Qt, 128): row-folded wx*G
            Gy = fold_dot(wy * G, kr)  # (Qt, 128): col-folded wy*G
            term = aw * (wy * wx)
            wsum = term if wsum is None else wsum + term
            # per-axis tent factors on the tiny (Qt, 128) coord axis: every
            # token of a level's grid row r shares wy == ay[q, r]
            dyr = py - rc
            dxc = px - rc
            ay = jnp.maximum(1.0 - jnp.abs(dyr), 0.0)
            sgny = jnp.where(jnp.abs(dyr) < 1.0, jnp.sign(dyr), 0.0)
            sgnx = jnp.where(jnp.abs(dxc) < 1.0, jnp.sign(dxc), 0.0)
            daw_cols.append(redsmall(ay * Gx))
            dpy_cols.append(-aw * redsmall(sgny * Gx))
            dpx_cols.append(-aw * redsmall(sgnx * Gy))
        ws_ref[:, off : off + seg] = wsum.astype(ws_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        ws_ref[...], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dv_ref.dtype)
    dpy_ref[0] = jnp.concatenate(dpy_cols, axis=1)
    dpx_ref[0] = jnp.concatenate(dpx_cols, axis=1)
    daw_ref[0] = jnp.concatenate(daw_cols, axis=1)


def _bwd_kernel(plan, P, prec, vdt, py_ref, px_ref, aw_ref, sy_ref, sx_ref,
                v_ref, g_ref, dv_ref, dpy_ref, dpx_ref, daw_ref, ws_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    def red(x):
        # token-axis reduction. bf16: an MXU dot against ones offloads the
        # 48 per-point column reductions from the VPU (the kernel's
        # bottleneck unit) to the otherwise idle MXU — measured -1.0
        # ms/call on the enc-layer bwd (round-3 ablation). fp32 parity mode
        # pins every dot to HIGHEST (6-pass), which makes the same 48 dots
        # SLOWER than the VPU sums they replaced (and default-precision
        # dots drift parity) — so fp32 reduces on the VPU, exactly.
        if prec == jax.lax.Precision.HIGHEST:
            return jnp.sum(x, axis=1, keepdims=True)
        return jax.lax.dot_general(
            x, jnp.ones((x.shape[1], 8), jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )[:, :1]

    g = g_ref[0]  # (Qt, D)
    # one MXU dot over the whole padded token axis: G[q, s] = sum_d g V
    G_all = jax.lax.dot_general(
        g, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (Qt, S_pad)
    dpy_cols, dpx_cols, daw_cols = [], [], []
    for l, (off, seg) in enumerate(plan):
        sy = sy_ref[:, off : off + seg]
        sx = sx_ref[:, off : off + seg]
        G = G_all[:, off : off + seg]
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
            # d(hat)/dpy = wx * dwy, dwy = -sign(dy) on the open support; the
            # attn scale multiplies the reduced (Qt, 1) column
            ty = jnp.where(ady < 1.0, jnp.sign(dy), 0.0) * wxG
            tx = jnp.where(adx < 1.0, jnp.sign(dx), 0.0) * wyG
            dpy_cols.append(-aw * red(ty))
            dpx_cols.append(-aw * red(tx))
        ws_ref[:, off : off + seg] = wsum.astype(ws_ref.dtype)
    # dV = W^T @ g in ONE dot over the whole token axis, accumulated
    # across query tiles
    dv_ref[0] += jax.lax.dot_general(
        ws_ref[...], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dv_ref.dtype)
    dpy_ref[0] = jnp.concatenate(dpy_cols, axis=1)
    dpx_ref[0] = jnp.concatenate(dpx_cols, axis=1)
    daw_ref[0] = jnp.concatenate(daw_cols, axis=1)


def _fwd_kernel_fac(rplan, P, prec, vdt, py_ref, px_ref, aw_ref, e_ref,
                    f_ref, vrow_ref, out_ref, ay_scr, awx_scr):
    """Fully-factorized forward (round-3 ablation `fwdfac`): no (Qt, seg)
    hat plane is ever built. Per level the P points' row tents stack into
    Ay (P*Qt, 128); T = Ay @ Vrow row-combines values in (col*D) lane
    space; Axe = Awx @ E expands the aw-scaled col tents over D lanes; the
    output is (Axe * T) @ F folded (c, d) -> d. Three MXU dots per level —
    the dense plane's ~11 VPU ops per (q, token) disappear."""
    rc = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    Qt = py_ref.shape[1]
    Z = None
    for l, (woff, wd) in enumerate(rplan):
        for p in range(P):
            k = l * P + p
            py = py_ref[0, :, k : k + 1]
            px = px_ref[0, :, k : k + 1]
            aw = aw_ref[0, :, k : k + 1]
            ay_scr[p * Qt : (p + 1) * Qt, :] = jnp.maximum(
                1.0 - jnp.abs(py - rc), 0.0).astype(ay_scr.dtype)
            awx_scr[p * Qt : (p + 1) * Qt, :] = (
                aw * jnp.maximum(1.0 - jnp.abs(px - rc), 0.0)
            ).astype(awx_scr.dtype)
        T = jax.lax.dot_general(  # (P*Qt, wd) row-combined values
            ay_scr[...], vrow_ref[0, :, woff : woff + wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        Axe = jax.lax.dot_general(  # (P*Qt, wd) aw*ax over D lanes
            awx_scr[...], e_ref[0, :, woff : woff + wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        Zl = jax.lax.dot_general(  # fold (c, d) -> d
            (Axe * T).astype(vdt), f_ref[0, woff : woff + wd, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        Z = Zl if Z is None else Z + Zl
    o = Z[0:Qt]
    for p in range(1, P):
        o = o + Z[p * Qt : (p + 1) * Qt]
    out_ref[0] = o[:, : out_ref.shape[2]].astype(out_ref.dtype)


def _bwd_kernel_fac(rplan, P, D, prec, vdt, py_ref, px_ref, aw_ref, e_ref,
                    fc_ref, tg_ref, vrow_ref, vrowT_ref, g_ref, dvrow_ref,
                    dpy_ref, dpx_ref, daw_ref, ay_scr, ax_scr, g4_scr,
                    axg_scr, h_scr):
    """Fully-factorized backward (round-3 ablation `bwdfac`):
        dVrow_l = Ay^T @ (aw * Axg)      Axg[q,(c,d)] = ax[q,c] g[q,d]
        daw     = rowsum(Axg * T)        T = Ay @ Vrow (fwd recompute)
        dpy     = -aw * sum_r sgn_y * Q  Q = Axg @ VrowT
        dpx     = -aw * sum_c sgn_x * R  R = fold_c(Gexp * T)
    No G_all plane, no wsum plane, no (Qt, seg) objects at all."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        dvrow_ref[...] = jnp.zeros(dvrow_ref.shape, dvrow_ref.dtype)

    def redsmall(x):  # (P*Qt, 128) -> (P*Qt, 1) on the MXU
        return jax.lax.dot_general(
            x.astype(vdt), jnp.ones((128, 8), vdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)[:, :1]

    rc = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    Qt = py_ref.shape[1]
    g = g_ref[0]
    Dp = g4_scr.shape[1]
    for p in range(P):
        g4_scr[p * Qt : (p + 1) * Qt, :] = (
            g if Dp == D else jnp.pad(g, ((0, 0), (0, Dp - D)))
        ).astype(g4_scr.dtype)
    dpy_cols, dpx_cols, daw_cols = [], [], []
    for l, (woff, wd) in enumerate(rplan):
        for p in range(P):
            k = l * P + p
            py = py_ref[0, :, k : k + 1]
            px = px_ref[0, :, k : k + 1]
            ay_scr[p * Qt : (p + 1) * Qt, :] = jnp.maximum(
                1.0 - jnp.abs(py - rc), 0.0).astype(ay_scr.dtype)
            ax_scr[p * Qt : (p + 1) * Qt, :] = jnp.maximum(
                1.0 - jnp.abs(px - rc), 0.0).astype(ax_scr.dtype)
        T = jax.lax.dot_general(  # (P*Qt, wd) fwd recompute
            ay_scr[...], vrow_ref[0, :, woff : woff + wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        Axe = jax.lax.dot_general(  # ax over D lanes
            ax_scr[...], e_ref[0, :, woff : woff + wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        Gexp = jax.lax.dot_general(  # g over c lanes
            g4_scr[...], tg_ref[0, :, woff : woff + wd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        axg = Axe * Gexp
        axg_scr[:, :wd] = axg.astype(axg_scr.dtype)
        for p in range(P):
            aw = aw_ref[0, :, l * P + p : l * P + p + 1]
            h_scr[p * Qt : (p + 1) * Qt, :wd] = (
                aw * axg[p * Qt : (p + 1) * Qt]
            ).astype(h_scr.dtype)
        dvrow_ref[0, :, woff : woff + wd] += jax.lax.dot_general(
            ay_scr[...], h_scr[:, :wd], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dvrow_ref.dtype)
        daw_all = jax.lax.dot_general(  # rowsum(Axg * T)
            (axg * T).astype(vdt), jnp.ones((wd, 8), vdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)[:, :1]
        Q = jax.lax.dot_general(  # (P*Qt, 128) row-space grad field
            axg_scr[:, :wd], vrowT_ref[0, woff : woff + wd, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        R = jax.lax.dot_general(  # (P*Qt, 128) col-space grad field
            (Gexp * T).astype(vdt), fc_ref[0, woff : woff + wd, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        for p in range(P):
            k = l * P + p
            py = py_ref[0, :, k : k + 1]
            px = px_ref[0, :, k : k + 1]
            aw = aw_ref[0, :, k : k + 1]
            dyr = py - rc
            dxc = px - rc
            sgny = jnp.where(jnp.abs(dyr) < 1.0, jnp.sign(dyr), 0.0)
            sgnx = jnp.where(jnp.abs(dxc) < 1.0, jnp.sign(dxc), 0.0)
            sl = slice(p * Qt, (p + 1) * Qt)
            daw_cols.append(daw_all[sl])
            dpy_cols.append(-aw * redsmall(sgny * Q[sl]))
            dpx_cols.append(-aw * redsmall(sgnx * R[sl]))
    dpy_ref[0] = jnp.concatenate(dpy_cols, axis=1)
    dpx_ref[0] = jnp.concatenate(dpx_cols, axis=1)
    daw_ref[0] = jnp.concatenate(daw_cols, axis=1)


# ------------------------------------------------------------- layout glue


def _layouts(spatial_shapes, value, loc, attn, fac=False):
    """XLA-side layout prep (transposes/pads); shared fwd path, passed to
    the backward as residuals so it is never recomputed. With `fac` the
    value table comes back in the factorized kernels' row-space layout."""
    B, S, M, D = value.shape
    Lq, P = loc.shape[1], loc.shape[4]
    L = len(spatial_shapes)
    sizes, seg, offs, S_pad = _level_plan(spatial_shapes)
    Qt = min(Q_TILE, _round_up(Lq, 8))
    Lq_pad = _round_up(Lq, Qt)

    Hs = jnp.asarray([h for h, w in spatial_shapes], jnp.float32).reshape(1, 1, 1, L, 1)
    Ws = jnp.asarray([w for h, w in spatial_shapes], jnp.float32).reshape(1, 1, 1, L, 1)
    locf = loc.astype(jnp.float32)
    px = locf[..., 0] * Ws - 0.5  # (B, Lq, M, L, P)
    py = locf[..., 1] * Hs - 0.5

    def to_bm(x):  # (B, Lq, M, L, P) -> (B*M, Lq_pad, L*P)
        # pad BEFORE the transpose so XLA fuses the pad into the relayout
        # copy (pad-after materialized as a separate ~100us pass per array)
        x = jnp.pad(x, ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0), (0, 0)))
        return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(B * M, Lq_pad, L * P)

    pxb, pyb = to_bm(px), to_bm(py)
    # attn stays in its native dtype (bf16 in the headline mode): the
    # kernels upcast the (Qt, 1) per-point columns on read, which is free,
    # while a pre-kernel astype(f32) cost a 6x105us pad_convert pass and
    # doubled the residual footprint. Values are identical either way.
    awb = to_bm(attn)

    vt = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * M, S, D)
    if fac:
        return pyb, pxb, awb, _make_vrow(spatial_shapes, vt)
    parts, cur = [], 0
    for sz, sg in zip(sizes, seg):
        part = jax.lax.slice_in_dim(vt, cur, cur + sz, axis=1)
        parts.append(jnp.pad(part, ((0, 0), (0, sg - sz), (0, 0))))
        cur += sz
    vp = jnp.concatenate(parts, axis=1)  # (B*M, S_pad, D)
    return pyb, pxb, awb, vp


def _make_vrow(spatial_shapes, vt):
    """(B*M, S, D) value tokens -> (B*M, 128, WD) per-level row tables for
    the factorized kernels: level l's grid row r occupies sublane r of lane
    block l, with its w cells' D channels laid out contiguously."""
    BM, S, D = vt.shape
    wd_sizes, _, _, _ = _rowspace_plan(spatial_shapes, D)
    parts, cur = [], 0
    for (h, w), wd in zip(spatial_shapes, wd_sizes):
        sz = h * w
        vl = jax.lax.slice_in_dim(vt, cur, cur + sz, axis=1)
        vl = vl.reshape(BM, h, w * D)
        parts.append(jnp.pad(vl, ((0, 0), (0, 128 - h), (0, wd - w * D))))
        cur += sz
    return jnp.concatenate(parts, axis=2)


def _unrow(spatial_shapes, dvrow, D):
    """(B*M, 128, WD) row-table gradient -> (B*M, S, D) token gradient."""
    BM = dvrow.shape[0]
    wd_sizes, wd_offs, _, _ = _rowspace_plan(spatial_shapes, D)
    chunks = []
    for (h, w), wd, woff in zip(spatial_shapes, wd_sizes, wd_offs):
        vl = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(dvrow, woff, woff + w * D, axis=2),
            0, h, axis=1)
        chunks.append(vl.reshape(BM, h * w, D))
    return jnp.concatenate(chunks, axis=1)


def _q_spec(Qt, LP):
    return pl.BlockSpec((1, Qt, LP), lambda bm, q: (bm, q, 0), memory_space=pltpu.VMEM)


def _const_spec(S_pad):
    return pl.BlockSpec((1, S_pad), lambda bm, q: (0, 0), memory_space=pltpu.VMEM)


def _v_spec(S_pad, D):
    return pl.BlockSpec((1, S_pad, D), lambda bm, q: (bm, 0, 0), memory_space=pltpu.VMEM)


def _batch_partition_specs(mesh, arg_shapes, result_shape):
    """custom_partitioning helper: keep dim-0 (the B*M axis) sharding from
    the operands, force everything else replicated. Leading-dim-1 operands
    (the sy/sx grid maps) replicate fully."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_of(x):
        s = getattr(x.sharding, "spec", None)
        return s[0] if s is not None and len(s) else None

    batch = next((spec_of(x) for x in arg_shapes
                  if x.shape[0] != 1 and spec_of(x) is not None), None)

    def arg_sharding(x):
        if x.shape[0] == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(batch, *([None] * (len(x.shape) - 1))))

    arg_sh = tuple(arg_sharding(x) for x in arg_shapes)
    res_sh = jax.tree.map(
        lambda r: NamedSharding(mesh, P(batch, *([None] * (len(r.shape) - 1)))),
        result_shape,
    )
    return arg_sh, res_sh


def _fwd_pallas_call(spatial_shapes, P, Lq, out_dtype_name,
                     pyb, pxb, awb, sy, sx, vp):
    """Shape-driven pallas_call: grid/specs derive from the (possibly
    per-shard) operand shapes, so the same callable serves the single-chip
    path and each SPMD shard."""
    L = len(spatial_shapes)
    LP = L * P
    _, seg, offs, S_pad = _level_plan(spatial_shapes)
    BM, Lq_pad, _ = pyb.shape
    D = vp.shape[2]
    Qt = min(Q_TILE, _round_up(Lq, 8))
    kernel = functools.partial(
        _fwd_kernel, tuple(zip(offs, seg)), P, _precision(vp.dtype), vp.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(BM, Lq_pad // Qt),
        in_specs=[
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
            _const_spec(S_pad), _const_spec(S_pad),
            _v_spec(S_pad, D),
        ],
        out_specs=pl.BlockSpec(
            (1, Qt, D), lambda bm, q: (bm, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D), jnp.dtype(out_dtype_name)),
        scratch_shapes=[pltpu.VMEM((Qt, S_pad), vp.dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(pyb, pxb, awb, sy, sx, vp)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(spatial_shapes, P, Lq, out_dtype_name):
    """Mosaic kernels can't be auto-partitioned by the SPMD partitioner (a
    jit with dp/mp-sharded inputs on a multi-chip TPU fails to compile, as
    caught by scripts/aot_multichip.py on a v5e:2x4 topology). Declare the
    obvious rule: the pallas call is independent per B*M row — shard dim 0,
    replicate the rest, run the same kernel per shard."""
    from jax.experimental.custom_partitioning import custom_partitioning

    raw = functools.partial(_fwd_pallas_call, spatial_shapes, P, Lq,
                            out_dtype_name)

    @custom_partitioning
    def call(pyb, pxb, awb, sy, sx, vp):
        return raw(pyb, pxb, awb, sy, sx, vp)

    def partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh = _batch_partition_specs(mesh, arg_shapes, result_shape)
        return mesh, raw, res_sh, arg_sh

    def infer(mesh, arg_shapes, shape):
        _, res_sh = _batch_partition_specs(mesh, arg_shapes, shape)
        return res_sh

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b q k, b q k2, b q k3, o s, o2 s2, b s3 d -> b q d",
    )
    return call


def _fwd_call(spatial_shapes, dims, pyb, pxb, awb, vtab, out_dtype, fac):
    B, S, M, D, Lq, P = dims
    name = jnp.dtype(out_dtype).name
    if fac:
        E_np, F_np, _, _ = _rowspace_maps(spatial_shapes, D)
        dt = vtab.dtype
        out = _fwd_fac_partitioned(spatial_shapes, P, Lq, D, name)(
            pyb, pxb, awb, jnp.asarray(E_np, dt), jnp.asarray(F_np, dt), vtab
        )
    else:
        sy_np, sx_np = _grid_maps(spatial_shapes)
        out = _fwd_partitioned(spatial_shapes, P, Lq, name)(
            pyb, pxb, awb, jnp.asarray(sy_np), jnp.asarray(sx_np), vtab
        )
    out = out[:, :Lq].reshape(B, M, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Lq, M * D)


def _map_spec(r, c):
    """Replicated constant-map operand: leading dim 1."""
    return pl.BlockSpec((1, r, c), lambda bm, q: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_fac_pallas_call(spatial_shapes, P, Lq, D, out_dtype_name,
                         pyb, pxb, awb, e, f, vrow):
    LP = len(spatial_shapes) * P
    wd_sizes, wd_offs, WD, _ = _rowspace_plan(spatial_shapes, D)
    BM, Lq_pad, _ = pyb.shape
    Qt = min(Q_TILE, _round_up(Lq, 8))
    kernel = functools.partial(
        _fwd_kernel_fac, tuple(zip(wd_offs, wd_sizes)), P,
        _precision(vrow.dtype), vrow.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(BM, Lq_pad // Qt),
        in_specs=[
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
            _map_spec(128, WD), _map_spec(WD, 128),
            pl.BlockSpec((1, 128, WD), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Qt, D), lambda bm, q: (bm, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BM, Lq_pad, D),
                                       jnp.dtype(out_dtype_name)),
        scratch_shapes=[pltpu.VMEM((P * Qt, 128), vrow.dtype),
                        pltpu.VMEM((P * Qt, 128), vrow.dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(pyb, pxb, awb, e, f, vrow)


@functools.lru_cache(maxsize=None)
def _fwd_fac_partitioned(spatial_shapes, P, Lq, D, out_dtype_name):
    """Batch-dim custom partitioning for the factorized forward (see
    `_fwd_partitioned`); the constant maps are leading-dim-1 => replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning

    raw = functools.partial(_fwd_fac_pallas_call, spatial_shapes, P, Lq, D,
                            out_dtype_name)

    @custom_partitioning
    def call(pyb, pxb, awb, e, f, vrow):
        return raw(pyb, pxb, awb, e, f, vrow)

    def partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh = _batch_partition_specs(mesh, arg_shapes, result_shape)
        return mesh, raw, res_sh, arg_sh

    def infer(mesh, arg_shapes, shape):
        _, res_sh = _batch_partition_specs(mesh, arg_shapes, shape)
        return res_sh

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b q k, b q k2, b q k3, o r wd, o2 wd2 c, b r2 wd3 -> b q4 d"
        ),
    )
    return call


def _bwd_fac_pallas_call(spatial_shapes, P, Lq, D, pyb, pxb, awb, e, fc, tg,
                         vrow, vrowT, gb):
    LP = len(spatial_shapes) * P
    wd_sizes, wd_offs, WD, Dp = _rowspace_plan(spatial_shapes, D)
    BM, Lq_pad, _ = pyb.shape
    Qt = min(Q_TILE, _round_up(Lq, 8))
    WDmax = max(wd_sizes)
    vdt = vrow.dtype
    kernel = functools.partial(
        _bwd_kernel_fac, tuple(zip(wd_offs, wd_sizes)), P, D,
        _precision(vdt), vdt,
    )
    return pl.pallas_call(
        kernel,
        grid=(BM, Lq_pad // Qt),
        in_specs=[
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
            _map_spec(128, WD), _map_spec(WD, 128), _map_spec(Dp, WD),
            pl.BlockSpec((1, 128, WD), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WD, 128), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Qt, D), lambda bm, q: (bm, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 128, WD), lambda bm, q: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BM, 128, WD), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((P * Qt, 128), vdt),
            pltpu.VMEM((P * Qt, 128), vdt),
            pltpu.VMEM((P * Qt, Dp), vdt),
            pltpu.VMEM((P * Qt, WDmax), vdt),
            pltpu.VMEM((P * Qt, WDmax), vdt),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(pyb, pxb, awb, e, fc, tg, vrow, vrowT, gb)


@functools.lru_cache(maxsize=None)
def _bwd_fac_partitioned(spatial_shapes, P, Lq, D):
    """Batch-dim custom partitioning for the factorized backward."""
    from jax.experimental.custom_partitioning import custom_partitioning

    raw = functools.partial(_bwd_fac_pallas_call, spatial_shapes, P, Lq, D)

    @custom_partitioning
    def call(pyb, pxb, awb, e, fc, tg, vrow, vrowT, gb):
        return raw(pyb, pxb, awb, e, fc, tg, vrow, vrowT, gb)

    def partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh = _batch_partition_specs(mesh, arg_shapes, result_shape)
        return mesh, raw, res_sh, arg_sh

    def infer(mesh, arg_shapes, shape):
        _, res_sh = _batch_partition_specs(mesh, arg_shapes, shape)
        return res_sh

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=(
            "b q k, b q k2, b q k3, o r wd, o2 wd2 c, o3 dp wd3, "
            "b r2 wd4, b wd5 c2, b q3 d "
            "-> b r3 wd6, b q4 k4, b q5 k5, b q6 k6"
        ),
    )
    return call


def _bwd_pallas_call(spatial_shapes, P, Lq, separable, pyb, pxb, awb, sy, sx,
                     *rest):
    if separable:
        kc, kr, vp, gb = rest
    else:
        vp, gb = rest
    L = len(spatial_shapes)
    LP = L * P
    _, seg, offs, S_pad = _level_plan(spatial_shapes)
    BM, Lq_pad, _ = pyb.shape
    D = vp.shape[2]
    Qt = min(Q_TILE, _round_up(Lq, 8))
    body = _bwd_kernel_sep if separable else _bwd_kernel
    kernel = functools.partial(
        body, tuple(zip(offs, seg)), P, _precision(vp.dtype), vp.dtype,
    )
    fold_specs = (
        [pl.BlockSpec((1, S_pad, 128), lambda bm, q: (0, 0, 0),
                      memory_space=pltpu.VMEM)] * 2
        if separable else []
    )
    return pl.pallas_call(
        kernel,
        grid=(BM, Lq_pad // Qt),
        in_specs=[
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
            _const_spec(S_pad), _const_spec(S_pad),
            *fold_specs,
            _v_spec(S_pad, D),
            pl.BlockSpec((1, Qt, D), lambda bm, q: (bm, q, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S_pad, D), lambda bm, q: (bm, 0, 0), memory_space=pltpu.VMEM),
            _q_spec(Qt, LP), _q_spec(Qt, LP), _q_spec(Qt, LP),
        ),
        out_shape=(
            # dvalue in the value dtype when one query tile covers Lq (the
            # production shapes): the downstream cast to value.dtype then
            # happens at the kernel write instead of a separate 12x125us
            # convert pass + doubled unpad/transpose traffic. Multi-tile
            # grids keep f32 so the cross-tile accumulation stays exact.
            jax.ShapeDtypeStruct(
                (BM, S_pad, D),
                vp.dtype if Lq_pad // Qt == 1 else jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
            jax.ShapeDtypeStruct((BM, Lq_pad, LP), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Qt, S_pad), vp.dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(pyb, pxb, awb, sy, sx, *rest)


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(spatial_shapes, P, Lq, separable):
    """Batch-dim custom partitioning for the backward kernel (see
    `_fwd_partitioned`). The separable variant carries two extra constant
    fold-map operands (leading dim 1 => fully replicated)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    raw = functools.partial(_bwd_pallas_call, spatial_shapes, P, Lq, separable)

    if separable:
        @custom_partitioning
        def call(pyb, pxb, awb, sy, sx, kc, kr, vp, gb):
            return raw(pyb, pxb, awb, sy, sx, kc, kr, vp, gb)

        rule = (
            "b q k, b q k2, b q k3, o s, o2 s2, o3 s5 c, o4 s6 c2, "
            "b s3 d, b q2 d2 -> b s4 d3, b q3 k4, b q4 k5, b q5 k6"
        )
    else:
        @custom_partitioning
        def call(pyb, pxb, awb, sy, sx, vp, gb):
            return raw(pyb, pxb, awb, sy, sx, vp, gb)

        rule = (
            "b q k, b q k2, b q k3, o s, o2 s2, b s3 d, b q2 d2 "
            "-> b s4 d3, b q3 k4, b q4 k5, b q5 k6"
        )

    def partition(mesh, arg_shapes, result_shape):
        arg_sh, res_sh = _batch_partition_specs(mesh, arg_shapes, result_shape)
        return mesh, raw, res_sh, arg_sh

    def infer(mesh, arg_shapes, shape):
        _, res_sh = _batch_partition_specs(mesh, arg_shapes, shape)
        return res_sh

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return call


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _msda_pallas(spatial_shapes, dims, value, loc, attn):
    fac = _fac_ok(spatial_shapes, dims[3])
    pyb, pxb, awb, vtab = _layouts(spatial_shapes, value, loc, attn, fac)
    return _fwd_call(spatial_shapes, dims, pyb, pxb, awb, vtab, value.dtype,
                     fac)


def _msda_pallas_fwd(spatial_shapes, dims, value, loc, attn):
    fac = _fac_ok(spatial_shapes, dims[3])
    pyb, pxb, awb, vtab = _layouts(spatial_shapes, value, loc, attn, fac)
    out = _fwd_call(spatial_shapes, dims, pyb, pxb, awb, vtab, value.dtype,
                    fac)
    marks = (jnp.zeros((0,), loc.dtype), jnp.zeros((0,), attn.dtype))
    return out, (pyb, pxb, awb, vtab, marks)


def _msda_pallas_bwd(spatial_shapes, dims, res, g):
    pyb, pxb, awb, vtab, (loc_mark, attn_mark) = res
    B, S, M, D, Lq, P = dims
    L = len(spatial_shapes)
    LP = L * P
    sizes, seg, offs, S_pad = _level_plan(spatial_shapes)
    Lq_pad = pyb.shape[1]
    Qt = min(Q_TILE, _round_up(Lq, 8))

    gb = g.reshape(B, Lq, M, D).astype(vtab.dtype)
    gb = jnp.pad(gb, ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0)))
    gb = jnp.transpose(gb, (0, 2, 1, 3)).reshape(B * M, Lq_pad, D)

    if _fac_ok(spatial_shapes, D):
        E_np, _, Fc_np, Tg_np = _rowspace_maps(spatial_shapes, D)
        dt = vtab.dtype
        dvrow, dpy, dpx, daw = _bwd_fac_partitioned(spatial_shapes, P, Lq, D)(
            pyb, pxb, awb, jnp.asarray(E_np, dt), jnp.asarray(Fc_np, dt),
            jnp.asarray(Tg_np, dt), vtab, jnp.swapaxes(vtab, 1, 2), gb
        )
        dvs = _unrow(spatial_shapes, dvrow, D).reshape(B, M, S, D)
        dvalue = jnp.transpose(dvs, (0, 2, 1, 3)).astype(vtab.dtype)
    else:
        sy_np, sx_np = _grid_maps(spatial_shapes)
        separable = _separable_ok(spatial_shapes, vtab.dtype)
        extras = ()
        if separable:
            kc_np, kr_np = _fold_maps(spatial_shapes)
            extras = (jnp.asarray(kc_np), jnp.asarray(kr_np))
        dv, dpy, dpx, daw = _bwd_partitioned(spatial_shapes, P, Lq, separable)(
            pyb, pxb, awb, jnp.asarray(sy_np), jnp.asarray(sx_np), *extras,
            vtab, gb
        )

        # dvalue: unpad level segments, restore (B, S, M, D)
        parts = []
        for sz, off in zip(sizes, offs):
            parts.append(jax.lax.slice_in_dim(dv, off, off + sz, axis=1))
        dvs = jnp.concatenate(parts, axis=1).reshape(B, M, S, D)
        dvalue = jnp.transpose(dvs, (0, 2, 1, 3)).astype(vtab.dtype)

    def from_bm(x):  # (B*M, Lq_pad, LP) -> (B, Lq, M, L, P)
        x = x[:, :Lq].reshape(B, M, Lq, L, P)
        return jnp.transpose(x, (0, 2, 1, 3, 4))

    Hs = jnp.asarray([h for h, w in spatial_shapes], jnp.float32).reshape(1, 1, 1, L, 1)
    Ws = jnp.asarray([w for h, w in spatial_shapes], jnp.float32).reshape(1, 1, 1, L, 1)
    # chain rule through px = loc_x * W_l - 0.5 (and py / H_l)
    dloc = jnp.stack(
        [from_bm(dpx) * Ws, from_bm(dpy) * Hs], axis=-1
    ).astype(loc_mark.dtype)
    dattn = from_bm(daw).astype(attn_mark.dtype)
    return dvalue, dloc, dattn


_msda_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    """MSDA with the Pallas chunked hat-product kernel. Same contract as
    `ops.msda.ms_deform_attn` (see that module's docstring for shapes)."""
    B, S, M, D = value.shape
    Lq, P = sampling_locations.shape[1], sampling_locations.shape[4]
    return _msda_pallas(
        tuple(tuple(int(x) for x in s) for s in spatial_shapes),
        (B, S, M, D, Lq, P),
        value, sampling_locations, attention_weights,
    )
