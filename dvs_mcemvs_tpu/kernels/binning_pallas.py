"""Fused bilinear binning (one-hot matmul) — Pallas TPU kernel.

Binning a group's warped events into a dense z0 histogram is the first hot
stage of the MXU voting backend (ops/voting_hist.py step 2; the TPU-native
replacement for the per-event scatter in the reference's fillVoxelGrid,
mapper_emvs_stereo/src/mapper_emvs_stereo.cpp:151-205):

    hist[q, p] = sum_e w_e * hat(q - hy_e) * hat(p - hx_e)
               = (w * Ay)^T @ Ax

The XLA formulation materializes the tap matrices Ay (E, hs) and Ax (E, ws)
in HBM — ~47 MB per 16K-event group, ~3 GB per million-event chunk, which
makes the stage HBM-bound at ~47% MXU utilization.  This kernel builds the
taps in VMEM per event block and contracts them immediately; HBM traffic
drops to the event coordinates in and the histogram out.

An int8 path quantizes taps to 1/127 steps and accumulates exactly in int32
(the MXU's double-rate int8 mode), halving the matmul time again; vote
magnitudes keep ~0.8% worst-case quantization error — far below vote-count
noise (same tradeoff as the XLA i8 path, ops/voting_hist.py:167-177).

Grid: (G, E/EB) with the event-block axis innermost; the (1, hs, ws) f32
histogram block stays resident in VMEM and accumulates across event blocks.

The windowed variant first sorts each group's events by row.  A block of
sorted events spans only a few histogram rows (its quantile range), so its
row taps cover a handful of `WH`-row strips instead of all hs rows — the
y-tap matmul shrinks from (hs, EB) to (n_strips*WH, EB), cutting the MXU
work by ~hs / (expected span).  Strips are ABSOLUTE (strip s = rows
[s*WH, (s+1)*WH)), so however a block's events are distributed the strip
sums partition the exact dense result: no votes are lost or double-counted,
and pathological distributions merely run more strips (bounded by hs/WH,
the dense cost).  The per-block strip range rides in as scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hx_ref, hy_ref, w_ref, out_ref, *, hs, ws, n_eb, int8):
    e = pl.program_id(1)
    # Event blocks arrive lane-major as (1, EB) vectors; taps are built with
    # events on the LANE axis and bins on sublanes, so the contraction runs
    # over lanes (an (hs, EB) @ (ws, EB)^T MXU dot) with no relayout.
    hx = hx_ref[0, 0]  # (1, EB)
    hy = hy_ref[0, 0]
    w = w_ref[0, 0]
    eb = hx.shape[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (hs, eb), 0).astype(jnp.float32)
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(hy - rows)) * w  # (hs, EB)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ws, eb), 0).astype(jnp.float32)
    ax = jnp.maximum(0.0, 1.0 - jnp.abs(hx - cols))      # (ws, EB)

    if int8:
        ayq = jnp.round(ay * 127.0).astype(jnp.int8)
        axq = jnp.round(ax * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            ayq, axq,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            ay.astype(jnp.bfloat16), ax.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(e == 0)
    def _():
        out_ref[0, :, :] = acc

    @pl.when(e > 0)
    def _():
        out_ref[0, :, :] += acc

    if int8:
        # Undo the 127^2 tap quantization scale once, on the final block.
        @pl.when(e == n_eb - 1)
        def _():
            out_ref[0, :, :] *= 1.0 / (127.0 * 127.0)


def _kernel_windowed(tlo_ref, ntl_ref, hx_ref, hy_ref, w_ref, out_ref,
                     *scratch, hs, ws, n_eb, wh, max_strips, int8):
    g = pl.program_id(0)
    e = pl.program_id(1)
    hx = hx_ref[0, 0]  # (1, EB)
    hy = hy_ref[0, 0]
    w = None if w_ref is None else w_ref[0, 0]
    eb = hx.shape[1]
    # With a non-f32 output dtype, accumulation runs in an f32 VMEM scratch
    # and the cast happens once on the final event block (saves the separate
    # HBM convert pass the caller would otherwise run).
    acc_out = scratch[0] if scratch else None

    cols = jax.lax.broadcasted_iota(jnp.int32, (ws, eb), 0).astype(jnp.float32)
    # With sign-packed binary weights (w_ref None), dropped events carry
    # hx = -2.0: every x-tap hat(-2 - col) is exactly 0, so no w multiply
    # is needed anywhere.
    ax = jnp.maximum(0.0, 1.0 - jnp.abs(hx - cols))      # (ws, EB)
    if int8:
        ax = jnp.round(ax * 127.0).astype(jnp.int8)
    else:
        ax = ax.astype(jnp.bfloat16)

    @pl.when(e == 0)
    def _():
        z = jnp.zeros((hs, ws), jnp.float32)
        if acc_out is not None:
            acc_out[:, :] = z
        else:
            out_ref[0, :, :] = z

    t_lo = tlo_ref[g, e]
    n_strips = ntl_ref[g, e]
    srows = jax.lax.broadcasted_iota(jnp.int32, (wh, eb), 0).astype(jnp.float32)
    for s in range(max_strips):
        @pl.when(s < n_strips)
        def _():
            base = (t_lo + s) * wh
            rows = srows + base.astype(jnp.float32)
            ay = jnp.maximum(0.0, 1.0 - jnp.abs(hy - rows))       # (WH, EB)
            if w is not None:
                ay = ay * w
            if int8:
                ayq = jnp.round(ay * 127.0).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    ayq, ax,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:
                acc = jax.lax.dot_general(
                    ay.astype(jnp.bfloat16), ax,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            off = pl.multiple_of(base, wh)
            if acc_out is not None:
                acc_out[pl.ds(off, wh), :] += acc
            else:
                out_ref[0, pl.ds(off, wh), :] += acc

    @pl.when(e == n_eb - 1)
    def _():
        if int8 and acc_out is not None:
            out_ref[0, :, :] = (acc_out[:, :] * (1.0 / (127.0 * 127.0))
                                ).astype(out_ref.dtype)
        elif int8:
            out_ref[0, :, :] *= 1.0 / (127.0 * 127.0)
        elif acc_out is not None:
            out_ref[0, :, :] = acc_out[:, :].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hs", "ws", "event_block", "int8", "interpret"))
def bin_events_pallas(
    hx: jnp.ndarray,
    hy: jnp.ndarray,
    w: jnp.ndarray,
    *,
    hs: int,
    ws: int,
    event_block: int = 1024,
    int8: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """hist[g, q, p] = sum_e w[g,e] hat(q - hy[g,e]) hat(p - hx[g,e]).

    hx, hy, w: (G, E) f32, coordinates already clipped to [0, ws-1] /
    [0, hs-1] with out-of-grid events zero-weighted (the caller,
    ops/voting_hist.build_group_histograms, does both).  hs must be a
    multiple of 8 and ws a multiple of 128 (VMEM tiling).  Event streams
    are padded with zero-weight events to an (8*128)-aligned block size.
    Returns (G, hs, ws) float32.
    """
    G, E = hx.shape
    if hs % 8 or ws % 128:
        raise ValueError(f"hs ({hs}) must be 8-aligned, ws ({ws}) 128-aligned")
    # Pad E up to a block multiple with zero-weight events at bin (0, 0),
    # then expose each block as a lane-major (1, EB) vector.
    eb = -(-event_block // 1024) * 1024
    e_pad = -E % eb
    if e_pad:
        hx = jnp.pad(hx, ((0, 0), (0, e_pad)))
        hy = jnp.pad(hy, ((0, 0), (0, e_pad)))
        w = jnp.pad(w, ((0, 0), (0, e_pad)))
    n_eb = (E + e_pad) // eb
    shape4 = (G, n_eb, 1, eb)
    hx, hy, w = (a.reshape(shape4) for a in (hx, hy, w))

    ev_spec = pl.BlockSpec((1, 1, 1, eb), lambda g, e: (g, e, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, hs=hs, ws=ws, n_eb=n_eb, int8=int8)
    return pl.pallas_call(
        kern,
        grid=(G, n_eb),
        in_specs=[ev_spec, ev_spec, ev_spec],
        out_specs=pl.BlockSpec((1, hs, ws), lambda g, e: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, hs, ws), jnp.float32),
        interpret=interpret,
    )(hx, hy, w)


@functools.partial(
    jax.jit,
    static_argnames=("hs", "ws", "event_block", "window_rows", "int8",
                     "binary_w", "out_dtype", "interpret"))
def bin_events_pallas_windowed(
    hx: jnp.ndarray,
    hy: jnp.ndarray,
    w: jnp.ndarray,
    *,
    hs: int,
    ws: int,
    event_block: int = 1024,
    window_rows: int = 64,
    int8: bool = False,
    binary_w: bool = False,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sorted-window variant of `bin_events_pallas` (same contract).

    Sorts each group by row coordinate so event blocks are row-quantile
    ranges, then bins each block only into the `window_rows`-row strips its
    events actually touch.  Exact for any event distribution (see module
    docstring); hs must be a multiple of `window_rows`.

    `binary_w=True` asserts w is 0/1-valued (true whenever the caller's
    per-event weights come only from validity/padding masks): the weight is
    sign-packed into hx (dropped events get hx = -2.0, whose bilinear
    x-taps are identically zero), so the row sort moves two payloads
    instead of three and the kernel skips the weight multiply — the sort is
    ~1/3 of this stage's time at 1 Mi events.  CONTRACT, not checked in
    kernel: under binary_w any w > 0 contributes with weight exactly 1.0
    (the magnitude is discarded by the sign-packing) — callers with
    fractional weights must leave binary_w False or get silently wrong
    histograms.

    `out_dtype` (e.g. bfloat16) casts the finished histogram in-kernel
    (f32 VMEM accumulation either way), saving the caller's separate HBM
    convert pass.
    """
    G, E = hx.shape
    if hs % window_rows or ws % 128:
        raise ValueError(
            f"hs ({hs}) must be a multiple of window_rows ({window_rows}), "
            f"ws ({ws}) 128-aligned")
    eb = -(-event_block // 1024) * 1024
    e_pad = -E % eb
    if binary_w:
        hx = jnp.where(w > 0, hx, -2.0)
    if e_pad:
        # Padding carries zero weight; hy pads at the last row so padding
        # sorts to the stream tail and never widens a real block's strip
        # range.
        hx = jnp.pad(hx, ((0, 0), (0, e_pad)),
                     constant_values=-2.0 if binary_w else 0.0)
        hy = jnp.pad(hy, ((0, 0), (0, e_pad)), constant_values=float(hs - 1))
        if not binary_w:
            w = jnp.pad(w, ((0, 0), (0, e_pad)))
    # Unstable sort: the histogram is order-invariant under ties, and the
    # stability machinery costs ~40 % of the sort (0.90 -> 0.54 ms at
    # 1 Mi events on v5e, r5).
    if binary_w:
        hy, hx = jax.lax.sort((hy, hx), dimension=1, num_keys=1,
                              is_stable=False)
    else:
        hy, hx, w = jax.lax.sort((hy, hx, w), dimension=1, num_keys=1,
                                 is_stable=False)
    n_eb = (E + e_pad) // eb
    wh = window_rows
    max_strips = hs // wh

    hy_b = hy.reshape(G, n_eb, eb)
    first = jnp.floor(hy_b[:, :, 0]).astype(jnp.int32)
    last = jnp.floor(hy_b[:, :, -1]).astype(jnp.int32) + 1  # +1: bilinear tap
    t_lo = jnp.clip(first // wh, 0, max_strips - 1)
    t_hi = jnp.clip(last // wh, 0, max_strips - 1)
    n_strips = t_hi - t_lo + 1

    shape4 = (G, n_eb, 1, eb)
    ev_spec = pl.BlockSpec((1, 1, 1, eb), lambda g, e, *refs: (g, e, 0, 0),
                           memory_space=pltpu.VMEM)
    out_dtype = out_dtype or jnp.float32
    scratch = [] if out_dtype == jnp.float32 \
        else [pltpu.VMEM((hs, ws), jnp.float32)]
    if binary_w:
        hx, hy = (a.reshape(shape4) for a in (hx, hy))
        operands = (hx, hy)
        n_ev_in = 2

        def kern(tlo_ref, ntl_ref, hx_ref, hy_ref, out_ref, *scr):
            _kernel_windowed(tlo_ref, ntl_ref, hx_ref, hy_ref, None, out_ref,
                             *scr, hs=hs, ws=ws, n_eb=n_eb, wh=wh,
                             max_strips=max_strips, int8=int8)
    else:
        hx, hy, w = (a.reshape(shape4) for a in (hx, hy, w))
        operands = (hx, hy, w)
        n_ev_in = 3
        kern = functools.partial(_kernel_windowed, hs=hs, ws=ws, n_eb=n_eb,
                                 wh=wh, max_strips=max_strips, int8=int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # t_lo, n_strips as (G, n_eb) SMEM arrays
        grid=(G, n_eb),
        in_specs=[ev_spec] * n_ev_in,
        out_specs=pl.BlockSpec((1, hs, ws), lambda g, e, *refs: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, hs, ws), out_dtype),
        interpret=interpret,
    )(t_lo, n_strips, *operands)
