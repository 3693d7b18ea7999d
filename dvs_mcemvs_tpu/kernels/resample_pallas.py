"""Banded separable affine resample-and-accumulate — the Pallas TPU kernel
behind DSI voting's two hot stages (ops/voting_hist.py):

  * plane sweep:  DSI[zi]      = sum_g  resample(hist[g], map[g, zi])
  * leaf merge:   super[p]     = sum_l  resample(hist[p*R + l], map[p, l])

Both are sums of separable affine resamples of (hs, ws) histograms.  The
XLA formulation builds DENSE banded matrices (hat(q*s + t - v) has a width-2
band) and runs full (hs x Ho) / (ws x Wo) matmuls — correct, but ~4-6x the
necessary MXU work and it materializes every band matrix in HBM.

This kernel exploits the bandedness: an affine map sends an output tile of
TV rows to a CONTIGUOUS input band of ~TV/s + margin rows, so each output
tile needs one small (QV x TV) tap matrix built in VMEM (fused, never in
HBM) and one narrow matmul against a dynamically sliced band of the
histogram.  Maps whose scale drops below `scale_min` (band wider than one
block) tile their band into disjoint absolute strips with a predicated,
data-dependent strip count — exact for ANY scale; `scale_min` only sets
the single-strip fast path (sweep scales z0*(zi - Cz)/(zi*(z0 - Cz)) ~ 1).

Grid: (N, K) with K innermost; the (1, Ho, Wo) output block stays resident
in VMEM and accumulates across the K inner resamples (the reference's
OpenMP-over-planes axis becomes the N grid dimension;
mapper_emvs_stereo.cpp:166-172).

Constraints (enforced/arranged by callers in voting_hist):
  * ws and Wo multiples of 128 (lane width; pad and crop otherwise),
  * dynamic input-band starts aligned: q_lo to 8 rows, p_lo to 128 lanes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(dim: int, target: int, mult: int) -> int:
    """Largest tile <= target that is a multiple of `mult` (tiles overlap
    the tail by recompute, so it need not divide dim)."""
    t = min(dim, target)
    t -= t % mult
    return max(t, mult)


def _kernel(src_ref, sy_ref, ty_ref, sx_ref, tx_ref, hist_ref, out_ref, resy,
            *acc_scratch, Ho, Wo, hs, ws, TV, TU, QV, QU, acc_dtype, K):
    n = pl.program_id(0)
    k = pl.program_id(1)
    # With a bf16 output, accumulation runs in an f32 VMEM scratch and the
    # cast happens once on the final inner step (halves the HBM traffic of
    # chained resample levels, e.g. the butterfly merge).
    acc = acc_scratch[0] if acc_scratch else None
    sy = sy_ref[n, k]
    ty = ty_ref[n, k]
    sx = sx_ref[n, k]
    tx = tx_ref[n, k]
    inv_sy = 1.0 / sy
    inv_sx = 1.0 / sx

    # Maps whose scale dips below scale_min need an input band wider than
    # one QV/QU block: the band is tiled into DISJOINT absolute strips and
    # the strip count is data-dependent (predicated, 1 for in-bound scales).
    # Strip sums partition the exact result for ANY scale — no silent vote
    # loss (strips the clip forces to overlap are masked to their nominal
    # range, so nothing double-counts).
    max_by = -(-hs // QV)
    max_bx = -(-ws // QU)

    # --- y stage: resy[v, :] = sum_q hat(q*sy + ty - v) * hist[q, :] ------
    # resy holds the intermediate in acc_dtype (bf16 for bf16 inputs): the
    # x-stage matmul consumes it at acc_dtype anyway, and the kernel is
    # VMEM-traffic-bound (measured ~2 TB/s effective on v5e), so halving
    # the intermediate's bytes buys more than the (already-present)
    # f32->bf16 rounding costs.  Strip 0 writes its tile DIRECTLY (n_by is
    # always >= 1), killing the zero-init pass + read-modify-write of the
    # common single-strip case.
    n_vt = -(-Ho // TV)
    for vt in range(n_vt):
        v0 = min(vt * TV, Ho - TV)  # tail tile overlaps by recompute
        # input rows with nonzero taps: ((v0-1-ty)/sy, (v0+TV-ty)/sy)
        q_start = jnp.floor((v0 - 1 - ty) * inv_sy).astype(jnp.int32)
        q_start = jnp.clip(q_start, 0, hs - 1)
        q_start = (q_start // 8) * 8
        q_end = jnp.ceil((v0 + TV - ty) * inv_sy).astype(jnp.int32) + 1
        q_end = jnp.clip(q_end, q_start + 1, hs)
        n_by = (q_end - q_start + QV - 1) // QV

        for b in range(max_by):
            def strip(b=b):
                q_nom = q_start + b * QV  # 8-aligned by construction
                # Clip the READ start; mask re-read rows of earlier strips.
                q_lo = jnp.minimum(q_nom, hs - QV)
                q_lo = pl.multiple_of((q_lo // 8) * 8, 8)
                qq = jax.lax.broadcasted_iota(jnp.int32, (QV, TV), 0) + q_lo
                valid = qq >= q_nom
                qf = qq.astype(jnp.float32)
                vv = jax.lax.broadcasted_iota(jnp.int32, (QV, TV), 1).astype(
                    jnp.float32) + float(v0)
                taps = jnp.maximum(0.0, 1.0 - jnp.abs(qf * sy + ty - vv))
                taps = jnp.where(valid, taps, 0.0)
                band = hist_ref[0, pl.ds(q_lo, QV), :]
                acc = jax.lax.dot_general(
                    taps.astype(acc_dtype), band.astype(acc_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if b == 0:
                    resy[pl.ds(v0, TV), :] = acc.astype(resy.dtype)
                else:
                    resy[pl.ds(v0, TV), :] += acc.astype(resy.dtype)

            if b == 0:
                strip()
            else:
                pl.when(b < n_by)(strip)

    # --- x stage: out[:, u] += sum_p hat(p*sx + tx - u) * resy[:, p] ------
    tgt = out_ref if acc is None else acc

    @pl.when(k == 0)
    def _():
        if acc is None:
            tgt[0, :, :] = jnp.zeros((Ho, Wo), jnp.float32)
        else:
            tgt[:, :] = jnp.zeros((Ho, Wo), jnp.float32)

    for ut in range(Wo // TU):
        u0 = ut * TU
        p_start = jnp.floor((u0 - 1 - tx) * inv_sx).astype(jnp.int32)
        p_start = jnp.clip(p_start, 0, ws - 1)
        p_start = (p_start // 128) * 128
        p_end = jnp.ceil((u0 + TU - tx) * inv_sx).astype(jnp.int32) + 1
        p_end = jnp.clip(p_end, p_start + 1, ws)
        n_bx = (p_end - p_start + QU - 1) // QU

        idx = (0, slice(None), pl.ds(u0, TU)) if acc is None \
            else (slice(None), pl.ds(u0, TU))
        for b in range(max_bx):
            @pl.when(b < n_bx)
            def _():
                p_nom = p_start + b * QU
                p_lo = jnp.minimum(p_nom, ws - QU)
                p_lo = pl.multiple_of((p_lo // 128) * 128, 128)
                pp = jax.lax.broadcasted_iota(jnp.int32, (QU, TU), 0) + p_lo
                valid = pp >= p_nom
                pf = pp.astype(jnp.float32)
                uu = jax.lax.broadcasted_iota(jnp.int32, (QU, TU), 1).astype(
                    jnp.float32) + float(u0)
                taps = jnp.maximum(0.0, 1.0 - jnp.abs(pf * sx + tx - uu))
                taps = jnp.where(valid, taps, 0.0)
                band = resy[:, pl.ds(p_lo, QU)]
                tgt[idx] += jax.lax.dot_general(
                    band.astype(acc_dtype), taps.astype(acc_dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    if acc is not None:
        @pl.when(k == K - 1)
        def _():
            out_ref[0, :, :] = acc[:, :].astype(out_ref.dtype)


def _kernel_fanin(oidx_ref, sy_ref, ty_ref, sx_ref, tx_ref, blocks_ref,
                  out_ref, resy, *acc_scratch,
                  Ho, Wo, hs, ws, TV, TU, QV, QU, acc_dtype, K):
    """One grid step = ONE fully-reduced output: sum over the K resident
    source blocks of their banded resamples.  Same band/tile math as
    `_kernel`, restructured so the (K, hs, ws) input block is fetched once
    per GROUP (grid dim 0) and stays resident across the group's M outputs
    (grid dim 1) — the K-innermost formulation of `_kernel` re-fetches each
    source once per output instead."""
    g = pl.program_id(0)
    m = pl.program_id(1)
    acc = acc_scratch[0] if acc_scratch else None
    tgt = out_ref if acc is None else acc

    max_by = -(-hs // QV)
    max_bx = -(-ws // QU)
    n_vt = -(-Ho // TV)

    if acc is None:
        tgt[0, :, :] = jnp.zeros((Ho, Wo), jnp.float32)
    else:
        tgt[:, :] = jnp.zeros((Ho, Wo), jnp.float32)

    for k in range(K):
        sy = sy_ref[g, m, k]
        ty = ty_ref[g, m, k]
        sx = sx_ref[g, m, k]
        tx = tx_ref[g, m, k]
        inv_sy = 1.0 / sy
        inv_sx = 1.0 / sx

        # --- y stage: resy = Ry^T @ blocks[k] --------------------------
        # (acc_dtype intermediate + direct first-strip write: see _kernel)
        for vt in range(n_vt):
            v0 = min(vt * TV, Ho - TV)
            q_start = jnp.floor((v0 - 1 - ty) * inv_sy).astype(jnp.int32)
            q_start = jnp.clip(q_start, 0, hs - 1)
            q_start = (q_start // 8) * 8
            q_end = jnp.ceil((v0 + TV - ty) * inv_sy).astype(jnp.int32) + 1
            q_end = jnp.clip(q_end, q_start + 1, hs)
            n_by = (q_end - q_start + QV - 1) // QV

            for b in range(max_by):
                def strip(b=b, k=k, v0=v0, q_start=q_start, n_by=n_by,
                          sy=sy, ty=ty):
                    q_nom = q_start + b * QV
                    q_lo = jnp.minimum(q_nom, hs - QV)
                    q_lo = pl.multiple_of((q_lo // 8) * 8, 8)
                    qq = jax.lax.broadcasted_iota(jnp.int32, (QV, TV), 0) + q_lo
                    valid = qq >= q_nom
                    qf = qq.astype(jnp.float32)
                    vv = jax.lax.broadcasted_iota(
                        jnp.int32, (QV, TV), 1).astype(jnp.float32) + float(v0)
                    taps = jnp.maximum(0.0, 1.0 - jnp.abs(qf * sy + ty - vv))
                    taps = jnp.where(valid, taps, 0.0)
                    # blocks arrive k-flattened (1, K*hs, ws): the row
                    # offset k*hs is static per unrolled k, so this is the
                    # same fast-path 2D dynamic slice as _kernel's.
                    band = blocks_ref[0, pl.ds(k * hs + q_lo, QV), :]
                    acc_y = jax.lax.dot_general(
                        taps.astype(acc_dtype), band.astype(acc_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if b == 0:
                        resy[pl.ds(v0, TV), :] = acc_y.astype(resy.dtype)
                    else:
                        resy[pl.ds(v0, TV), :] += acc_y.astype(resy.dtype)

                if b == 0:
                    strip()
                else:
                    pl.when(b < n_by)(strip)

        # --- x stage: tgt += resy @ Cx ---------------------------------
        for ut in range(Wo // TU):
            u0 = ut * TU
            p_start = jnp.floor((u0 - 1 - tx) * inv_sx).astype(jnp.int32)
            p_start = jnp.clip(p_start, 0, ws - 1)
            p_start = (p_start // 128) * 128
            p_end = jnp.ceil((u0 + TU - tx) * inv_sx).astype(jnp.int32) + 1
            p_end = jnp.clip(p_end, p_start + 1, ws)
            n_bx = (p_end - p_start + QU - 1) // QU

            idx = (0, slice(None), pl.ds(u0, TU)) if acc is None \
                else (slice(None), pl.ds(u0, TU))
            for b in range(max_bx):
                @pl.when(b < n_bx)
                def _():
                    p_nom = p_start + b * QU
                    p_lo = jnp.minimum(p_nom, ws - QU)
                    p_lo = pl.multiple_of((p_lo // 128) * 128, 128)
                    pp = jax.lax.broadcasted_iota(jnp.int32, (QU, TU), 0) + p_lo
                    valid = pp >= p_nom
                    pf = pp.astype(jnp.float32)
                    uu = jax.lax.broadcasted_iota(
                        jnp.int32, (QU, TU), 1).astype(jnp.float32) + float(u0)
                    taps = jnp.maximum(0.0, 1.0 - jnp.abs(pf * sx + tx - uu))
                    taps = jnp.where(valid, taps, 0.0)
                    band = resy[:, pl.ds(p_lo, QU)]
                    tgt[idx] += jax.lax.dot_general(
                        band.astype(acc_dtype), taps.astype(acc_dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

    if acc is not None:
        out_ref[0, :, :] = acc[:, :].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "out_h", "out_w", "tile_v", "tile_u",
                     "scale_min", "interpret", "out_dtype"),
)
def banded_resample_fanin(
    blocks: jnp.ndarray,
    sy: jnp.ndarray,
    ty: jnp.ndarray,
    sx: jnp.ndarray,
    tx: jnp.ndarray,
    out_idx: jnp.ndarray,
    *,
    n_out: int,
    out_h: int,
    out_w: int,
    tile_v: int = 128,
    tile_u: int = 128,
    scale_min: float = 0.5,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """out[out_idx[g, m]] = sum_k resample(blocks[g, k], maps (sy..tx)[g, m, k]).

    The fetch-deduplicated formulation of `banded_resample_sum`: grid
    (Ngrp, M) with the whole (K, hs, ws) source block of group g resident
    across its M outputs, the K-reduction running INSIDE one step.  Each
    output is produced fully reduced in a single step, so a bf16 `out_dtype`
    needs no cross-step f32 scratch round trip, and source HBM traffic
    drops from N*K block fetches (the `banded_resample_sum` grid) to Ngrp.

    Callers: the butterfly merge (children of one node share their radix
    parent blocks; `out_idx` scatters each child straight into the standard
    (range, node) layout) and the plane sweep (planes of one inverse-depth
    segment share the segment's supergroup histograms; `out_idx` carries
    per-segment plane offsets, with CLAMPED CONSECUTIVE DUPLICATES padding
    ragged segments — a duplicate step recomputes the same plane from the
    same maps, which is idempotent).

    blocks: (Ngrp, K, hs, ws); sy/ty/sx/tx: (Ngrp, M, K) f32 forward maps;
    out_idx: (Ngrp, M) i32, each output index written by exactly one step
    (or by consecutive duplicate steps).  Returns (n_out, out_h, out_w).
    ws and out_w must be 128-multiples, hs an 8-multiple.
    """
    Ngrp, K, hs, ws = blocks.shape
    _, M, _ = sy.shape
    if sy.shape != (Ngrp, M, K):
        raise ValueError(f"maps shape {sy.shape} != {(Ngrp, M, K)}")
    if out_idx.shape != (Ngrp, M):
        raise ValueError(f"out_idx shape {out_idx.shape} != {(Ngrp, M)}")
    if ws % 128 or out_w % 128:
        raise ValueError(f"ws ({ws}) and out_w ({out_w}) must be 128-multiples")
    if hs % 8:
        raise ValueError(f"hs ({hs}) must be an 8-multiple")
    out_dtype = out_dtype or jnp.float32
    bf16_out = out_dtype == jnp.bfloat16

    TV = _pick_tile(out_h, tile_v, 8)
    TU = _pick_tile(out_w, tile_u, 128)
    qv = int(np.ceil(TV / scale_min)) + 24
    QV = min(hs, qv + (-qv % 8))
    qu = int(np.ceil(TU / scale_min)) + 24
    QU = min(ws, qu + (-qu % 128))
    acc_dtype = blocks.dtype if blocks.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32

    kern = functools.partial(
        _kernel_fanin, Ho=out_h, Wo=out_w, hs=hs, ws=ws,
        TV=TV, TU=TU, QV=QV, QU=QU, acc_dtype=acc_dtype, K=K)
    scratch = [pltpu.VMEM((out_h, ws), acc_dtype)]
    if bf16_out:
        scratch.append(pltpu.VMEM((out_h, out_w), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # out_idx, sy, ty, sx, tx as SMEM arrays
        grid=(Ngrp, M),
        in_specs=[
            pl.BlockSpec((1, K * hs, ws), lambda g, m, *refs: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_h, out_w),
            lambda g, m, oidx_ref, *refs: (oidx_ref[g, m], 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, out_h, out_w), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )(out_idx.astype(jnp.int32), sy.astype(jnp.float32),
      ty.astype(jnp.float32), sx.astype(jnp.float32),
      tx.astype(jnp.float32), blocks.reshape(Ngrp, K * hs, ws))


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "blocked", "tile_v", "tile_u",
                     "scale_min", "interpret", "out_dtype"),
)
def banded_resample_sum(
    hist: jnp.ndarray,
    sy: jnp.ndarray,
    ty: jnp.ndarray,
    sx: jnp.ndarray,
    tx: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    blocked: bool,
    tile_v: int = 128,
    tile_u: int = 128,
    scale_min: float = 0.5,
    interpret: bool = False,
    src: jnp.ndarray = None,
    out_dtype=None,
) -> jnp.ndarray:
    """out[n] = sum_k resample(hist[src(n, k)], affine map (sy..tx)[n, k]).

    hist: (G, hs, ws); sy/ty/sx/tx: (N, K) f32 bin-coordinate maps
    (forward convention: output position = input position * s + t).
    blocked=False: src = k (K == G, every output sums all histograms —
    the plane sweep).  blocked=True: src = n*K + k (G == N*K, disjoint
    groups — the leaf merge).  An explicit `src` (N, K) i32 array overrides
    both: source blocks are gathered straight from `hist` via scalar
    prefetch, so callers with shared parents (the butterfly merge) never
    materialize duplicated inputs.  Returns (N, out_h, out_w) in
    `out_dtype` (default float32; accumulation is f32 either way).

    `scale_min` is a PERFORMANCE hint: maps with scale >= scale_min resolve
    each output tile with a single TV/scale_min-row band matmul; smaller
    scales loop over extra disjoint band strips (predicated) and stay
    exact.  The voting callers' sweep scales are >= 2/3 per supersample
    unit whenever the camera advances less than min_depth/3 in a chunk.

    ws and out_w must be multiples of 128, hs of 8; interpret=True off-TPU.
    """
    G, hs, ws = hist.shape
    N, K = sy.shape
    if ws % 128 or out_w % 128:
        raise ValueError(f"ws ({ws}) and out_w ({out_w}) must be 128-multiples")
    if hs % 8:
        raise ValueError(f"hs ({hs}) must be an 8-multiple")
    if src is None:
        if blocked and G != N * K:
            raise ValueError(f"blocked mode needs G == N*K, got {G} != {N}*{K}")
        if not blocked and G != K:
            raise ValueError(f"sweep mode needs G == K, got {G} != {K}")
        if blocked:
            base = jnp.arange(N, dtype=jnp.int32)[:, None] * K
            src = base + jnp.arange(K, dtype=jnp.int32)[None, :]
        else:
            src = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                                   (N, K))
    elif src.shape != (N, K):
        raise ValueError(f"src shape {src.shape} != maps shape {(N, K)}")
    out_dtype = out_dtype or jnp.float32
    bf16_out = out_dtype == jnp.bfloat16

    TV = _pick_tile(out_h, tile_v, 8)
    TU = _pick_tile(out_w, tile_u, 128)
    # Band blocks: sized so maps with scale >= scale_min fit in ONE strip
    # (wider bands just run more strips — exact either way).  Strip starts
    # stay 8-/128-aligned because QV/QU are themselves aligned.
    qv = int(np.ceil(TV / scale_min)) + 24
    QV = min(hs, qv + (-qv % 8))
    qu = int(np.ceil(TU / scale_min)) + 24
    QU = min(ws, qu + (-qu % 128))
    acc_dtype = hist.dtype if hist.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32

    hist_map = lambda n, k, src_ref, *refs: (src_ref[n, k], 0, 0)

    kern = functools.partial(
        _kernel, Ho=out_h, Wo=out_w, hs=hs, ws=ws,
        TV=TV, TU=TU, QV=QV, QU=QU, acc_dtype=acc_dtype, K=K)
    scratch = [pltpu.VMEM((out_h, ws), acc_dtype)]
    if bf16_out:
        scratch.append(pltpu.VMEM((out_h, out_w), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # src, sy, ty, sx, tx as (N, K) SMEM arrays
        grid=(N, K),
        in_specs=[
            pl.BlockSpec((1, hs, ws), hist_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w),
                               lambda n, k, *refs: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, out_h, out_w), out_dtype),
        interpret=interpret,
    )(src.astype(jnp.int32), sy.astype(jnp.float32), ty.astype(jnp.float32),
      sx.astype(jnp.float32), tx.astype(jnp.float32), hist)
