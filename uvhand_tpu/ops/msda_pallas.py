"""Pallas MSDA kernel (blocked: toolchain).

The fused gather+reduce kernel design is ready (corner-fused 4*D-wide table
rows; per-head column groups so ONE `tpu.dynamic_gather` serves all heads;
chunked same-shape gathers sized to the table; backward via per-head one-hot
MXU contractions accumulated across chunks — see PERF.md), but Mosaic's
`tpu.dynamic_gather` lowering (`jnp.take_along_axis` inside a kernel)
currently CRASHES the axon remote Mosaic compiler in this image
(HTTP 500, tpu_compile_helper exit 1 — minimal repro: a (512, 128)
take_along_axis kernel).

Until the toolchain updates, `impl="xla"` (ops/msda.py) is the production
path: a single flat lane-aligned gather + custom VJP, profiled at ~23 ms
fwd / ~18 ms bwd per encoder layer (B=16, fp32) and verified bit-exact
against the torch grid_sample oracle.
"""

from __future__ import annotations


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    raise NotImplementedError(
        "Pallas MSDA is blocked on a Mosaic dynamic_gather compiler crash in "
        "this toolchain (see module docstring and PERF.md); use impl='xla'."
    )
