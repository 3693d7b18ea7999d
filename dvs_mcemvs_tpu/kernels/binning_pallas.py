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
