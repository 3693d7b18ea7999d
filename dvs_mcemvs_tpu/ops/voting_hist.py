"""Histogram + separable affine-resample voting backend — the TPU-native
formulation of the DSI hot kernel.

The reference's `fillVoxelGrid` (mapper_emvs_stereo/src/mapper_emvs_stereo.cpp:
151-205) splats every event bilinearly into every depth plane: O(E x Z)
random scatter-adds — the one access pattern TPUs have no hardware for (XLA
lowers non-unique scatter to a serialized loop; measured ~0.3 Mev/s on a
v5e chip).  This backend restructures the same math onto the MXU:

1. Eq. (15) (cpp:176-194) maps an event's z0-plane location to plane zi by a
   per-packet AFFINE transform whose coefficients depend on the packet only
   through its camera center C.  Neighboring packets have nearly identical
   centers (the rig moves ~mm between 1024-event packets), so packets are
   grouped into super-packets sharing one C — the same kind of controlled
   approximation as the reference's own 1024-event pose sharing (cpp:88-91),
   exposed as `group_size` (1 = exact per-packet coefficients).

2. Binning a group's events into a dense z0 histogram is a ONE-HOT MATMUL:
   hist[q, p] = sum_e w_e hat(q - hy_e) hat(p - hx_e) = (w * Ay)^T @ Ax with
   hat the width-1 triangle (bilinear) kernel — two tall-skinny matrices
   contracted over events on the systolic array, zero scatter.

3. Voting one plane = resampling that histogram under a separable affine map
   with scale ~= 1 (scale = z0(zi-Cz)/(zi(z0-Cz)) -> 1 for |Cz| << depths):
   two more banded-matrix matmuls, DSI[zi] += Ry^T @ hist @ Cx, where
   Ry[q, v] = hat(q*sy + ty - v), Cx[p, u] = hat(p*sx + tx - u).

All contractions run in bf16 with f32 accumulation (MXU native); vote
magnitudes are preserved to ~0.4% — far below vote-count noise.

The composition of the two triangle kernels (event->bin, bin->plane) widens
the effective splat from width-1 to width-2; `supersample=2` bins on a finer
grid to tighten it back toward the reference kernel.

Border semantics diverge deliberately: the reference drops an event's entire
4-corner vote when the +1 neighbor is out of bounds (cartesian3dgrid.h:
258-262); here partial taps at the image edge are kept.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .voting import WarpedPackets

logger = logging.getLogger(__name__)

# Scoped-VMEM budget for the Pallas engines: both kernels keep one full
# (hs, ws) f32 histogram block resident, triple-buffered by the pipeline,
# against a ~16 MB per-core VMEM.  Specs whose padded grid exceeds this
# degrade to the XLA engine (loudly — see splat_hist).
_VMEM_BUDGET_BYTES = 15 * 2**20


def _pallas_hist_vmem_bytes(hs: int, ws: int) -> int:
    """Pipeline-resident VMEM estimate of the Pallas engines' histogram
    block at the aligned grid size (f32, 3x multi-buffering)."""
    return (hs + (-hs % 64)) * (ws + (-ws % 128)) * 4 * 3


def _group_centers(packets: WarpedPackets, group_size: int):
    """Mean camera center over each super-packet's valid packets."""
    K = packets.centers.shape[0]
    G = -(-K // group_size)
    pad_k = G * group_size - K
    vb = packets.valid.astype(jnp.float32)
    cent = jnp.pad(packets.centers, ((0, pad_k), (0, 0)))
    vbp = jnp.pad(vb, (0, pad_k))
    cg = cent.reshape(G, group_size, 3)
    wg = vbp.reshape(G, group_size)
    denom = jnp.maximum(jnp.sum(wg, axis=1, keepdims=True), 1.0)
    return jnp.sum(cg * wg[..., None], axis=1) / denom


def _sweep_correction(xy, centers_k, centers_g, group_size, z0,
                      fx, fy, cx, cy, u_mid):
    """Per-event coordinate shift cancelling the packet-vs-group map error
    to first order in inverse depth.

    Eq. (15)'s affine coefficients are exactly linear in u = 1/zi:
    scale s(u) = alpha_s + beta_s*u with alpha_s = z0/(z0-Cz),
    beta_s = -z0*Cz/(z0-Cz); translation t(u) = alpha_t + beta_t*u with
    kappa = Cx*fx + Cz*cx, alpha_t = -kappa/(z0-Cz),
    beta_t = kappa*z0/(z0-Cz).  Binning an event at X + delta instead of X
    changes its group-map image by delta*s_g(u); choosing
    delta = (A + B*u_mid)/s_g(u_mid) with A/B the constant/slope parts of
    the per-packet-vs-group error zeroes the error at the sweep midpoint
    and minimaxes it over [u_min, u_max] — the residual is a u-odd spread
    (lateral blur), not a depth-correlated bias.  This is what lets
    `group_size` be large without tilting the vote rays.
    """
    K = centers_k.shape[0]
    G = centers_g.shape[0]

    def coeffs(C):
        Cz = C[:, 2]
        den = z0 - Cz
        a_s = z0 / den
        b_s = -z0 * Cz / den
        kx = C[:, 0] * fx + Cz * cx
        ky = C[:, 1] * fy + Cz * cy
        return (a_s, b_s, -kx / den, kx * z0 / den, -ky / den, ky * z0 / den)

    a_s_k, b_s_k, a_tx_k, b_tx_k, a_ty_k, b_ty_k = coeffs(centers_k)
    a_s_g, b_s_g, a_tx_g, b_tx_g, a_ty_g, b_ty_g = coeffs(centers_g)
    rep = lambda c: jnp.repeat(c, group_size)[:K]
    d_as = a_s_k - rep(a_s_g)
    d_bs = b_s_k - rep(b_s_g)
    s_mid = rep(a_s_g + b_s_g * u_mid)       # (K,), ~= 1

    X, Y = xy[..., 0], xy[..., 1]            # (K, P)
    ax = X * d_as[:, None] + (a_tx_k - rep(a_tx_g))[:, None]
    bx = X * d_bs[:, None] + (b_tx_k - rep(b_tx_g))[:, None]
    ay = Y * d_as[:, None] + (a_ty_k - rep(a_ty_g))[:, None]
    by = Y * d_bs[:, None] + (b_ty_k - rep(b_ty_g))[:, None]
    dx = (ax + bx * u_mid) / s_mid[:, None]
    dy = (ay + by * u_mid) / s_mid[:, None]
    return dx, dy


def build_group_histograms(
    packets: WarpedPackets,
    group_size: int,
    hs: int,
    ws: int,
    pad_x: int,
    pad_y: int,
    ss: int,
    dtype=jnp.bfloat16,
    correction: Optional[Tuple[float, float, float, float, float, float]] = None,
    engine: str = "xla",
    out_dtype=None,
    weights_binary: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear-bin each super-packet's z0 locations by one-hot matmul.

    `correction` = (z0, fx, fy, cx, cy, u_mid) enables the first-order
    sweep correction (see `_sweep_correction`).  `engine` = "pallas" runs
    the fused VMEM binning kernel (kernels/binning_pallas.py) instead of
    the XLA one-hot matmuls, eliminating the HBM round trip of the tap
    matrices.  `weights_binary` asserts that any explicit per-event weight
    on the packets is 0/1-valued (e.g. the sharded path's padding mask),
    which lets the windowed Pallas kernel take its sign-packed two-payload
    sort (see bin_events_pallas_windowed) even when `packets.weight` is
    set; fractional weights under this flag are silently rounded to 0/1.
    Returns (hist (G, hs, ws), centers (G, 3)); the histogram is float32
    unless `out_dtype` requests a cast (in-VMEM on the windowed kernel, a
    final convert otherwise; accumulation stays f32 either way).
    """
    K, P, _ = packets.xy_z0.shape
    G = -(-K // group_size)
    Kp = G * group_size
    Eg = group_size * P

    centers = _group_centers(packets, group_size)

    pw = packets.event_weights().reshape(K, P)
    xy = packets.xy_z0
    if correction is not None:
        z0c, fx, fy, cx, cy, u_mid = correction
        dx, dy = _sweep_correction(
            xy, packets.centers, centers, group_size, z0c, fx, fy, cx, cy, u_mid)
        xy = jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], axis=-1)

    pad_k = Kp - K
    xy = jnp.pad(xy, ((0, pad_k), (0, 0), (0, 0)))
    w = jnp.pad(pw, ((0, pad_k), (0, 0)))

    hx = ((xy[..., 0] + pad_x) * ss).reshape(G, Eg)
    hy = ((xy[..., 1] + pad_y) * ss).reshape(G, Eg)
    w = w.reshape(G, Eg)
    # Drop events whose z0 location falls outside even the padded grid.
    inb = (hx >= 0) & (hx <= ws - 1) & (hy >= 0) & (hy <= hs - 1)
    w = jnp.where(inb, w, 0.0)
    hx = jnp.clip(hx, 0.0, ws - 1)
    hy = jnp.clip(hy, 0.0, hs - 1)

    if engine == "pallas":
        from ..kernels.binning_pallas import (
            bin_events_pallas, bin_events_pallas_windowed)

        if hs % 64 == 0:
            # Weights are 0/1 whenever no explicit per-event weight rides on
            # the packets (validity + padding + in-bounds masks only), or
            # when the caller asserts binariness (`weights_binary`, the
            # sharded path's 0/1 padding mask) — the windowed kernel then
            # sign-packs them into hx and sorts one payload less.
            hist = bin_events_pallas_windowed(
                hx, hy, w, hs=hs, ws=ws, int8=(dtype == jnp.int8),
                binary_w=packets.weight is None or weights_binary,
                out_dtype=out_dtype, interpret=_pallas_interpret())
        else:  # odd grid (tests): dense fused kernel
            hist = bin_events_pallas(
                hx, hy, w, hs=hs, ws=ws, int8=(dtype == jnp.int8),
                interpret=_pallas_interpret())
            if out_dtype is not None:
                hist = hist.astype(out_dtype)
        return hist, centers

    rows = jnp.arange(hs, dtype=jnp.float32)
    cols = jnp.arange(ws, dtype=jnp.float32)

    int8 = dtype == jnp.int8

    def one_group(args):
        hxg, hyg, wg = args
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(hyg[:, None] - rows[None, :]))
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(hxg[:, None] - cols[None, :]))
        ay = ay * wg[:, None]
        if int8:
            # Quantized binning on the int8 MXU path: bilinear taps in
            # 1/127 steps, exact int32 accumulation (max bin sum
            # E*127^2 < 2^31), one rescale at the end.
            ayq = jnp.round(ay * 127.0).astype(jnp.int8)
            axq = jnp.round(ax * 127.0).astype(jnp.int8)
            acc = jax.lax.dot_general(
                ayq, axq,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
        return jax.lax.dot_general(
            ay.astype(dtype), ax.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    hist = jax.lax.map(one_group, (hx, hy, w))
    return hist, centers


def _sweep_scale_trans(centers, u, z0, fx, fy, cx, cy):
    """Eq. (15) as scale/translation in inverse depth u = 1/zi.

    X' = s(u) * X + tx(u) (y alike) with s = z0*(1 - Cz*u)/(z0 - Cz),
    tx = (z0*u - 1) * (Cx*fx + Cz*cx)/(z0 - Cz).  centers (N, 3), u (M,).
    Returns s, tx, ty each (N, M).
    """
    C = centers
    den = (z0 - C[:, 2])[:, None]               # (N, 1)
    s = z0 * (1.0 - C[:, 2:3] * u[None, :]) / den
    kx = (C[:, 0] * fx + C[:, 2] * cx)[:, None]
    ky = (C[:, 1] * fy + C[:, 2] * cy)[:, None]
    t_common = (z0 * u[None, :] - 1.0) / den
    return s, kx * t_common, ky * t_common


def _resample_hist_affine(hist, s_y, t_y, s_x, t_x, dtype=jnp.bfloat16):
    """Push-forward resample of histograms under per-item separable affine
    maps in BIN coordinates: mass at bin (q, p) splats bilinearly to
    (q*s_y + t_y, p*s_x + t_x).  hist (N, hs, ws); s/t scalars per item.
    Mass-conserving for maps that stay inside the grid (same convention as
    the sweep's banded resample matrices in `splat_hist`)."""
    N, hs, ws = hist.shape
    qrow = jnp.arange(hs, dtype=jnp.float32)
    prow = jnp.arange(ws, dtype=jnp.float32)

    def one(args):
        h, sy, ty, sx, tx = args
        ry = jnp.maximum(0.0, 1.0 - jnp.abs(
            (qrow[:, None] * sy + ty) - qrow[None, :]))   # (q, q')
        cxm = jnp.maximum(0.0, 1.0 - jnp.abs(
            (prow[:, None] * sx + tx) - prow[None, :]))   # (p, p')
        tmp = jax.lax.dot_general(                        # (q', ws)
            ry.astype(dtype), h.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dot_general(                       # (q', p')
            tmp.astype(dtype), cxm.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return jax.lax.map(one, (hist, s_y, t_y, s_x, t_x))


def merge_leaf_histograms(
    hist: jnp.ndarray,
    centers: jnp.ndarray,
    merge: int,
    u_mid,
    z0: float,
    vcam_params,
    pad_x: int,
    pad_y: int,
    ss: int,
    dtype=jnp.bfloat16,
    engine: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge groups of `merge` leaf histograms into supergroup histograms.

    Each leaf is resampled from its own sweep frame into the supergroup
    center's frame so that at u = u_mid the supergroup map exactly
    reproduces the leaf map (first-order-in-u accurate across a segment —
    the histogram-level analog of `_sweep_correction`).  Returns
    (hist_super (G/merge, hs, ws), centers_super (G/merge, 3)).
    """
    fx, fy, cx, cy = vcam_params
    G = hist.shape[0]
    P = -(-G // merge)
    pad_g = P * merge - G
    if pad_g:
        hist = jnp.pad(hist, ((0, pad_g), (0, 0), (0, 0)))
        centers = jnp.concatenate(
            [centers, jnp.broadcast_to(centers[-1:], (pad_g, 3))])
    centers_super = jnp.mean(centers.reshape(P, merge, 3), axis=1)

    u = jnp.atleast_1d(jnp.asarray(u_mid, jnp.float32))
    s_l, tx_l, ty_l = _sweep_scale_trans(centers, u, z0, fx, fy, cx, cy)
    sup_rep = jnp.repeat(centers_super, merge, axis=0)
    s_p, tx_p, ty_p = _sweep_scale_trans(sup_rep, u, z0, fx, fy, cx, cy)
    # m = sweep_p(u_mid)^-1 o sweep_l(u_mid) in z0-plane coords, converted
    # to bin coords h = (X + pad) * ss.
    m_s = (s_l / s_p)[:, 0]
    m_tx = ((tx_l - tx_p) / s_p)[:, 0]
    m_ty = ((ty_l - ty_p) / s_p)[:, 0]
    bt_x = ss * (m_tx + pad_x * (1.0 - m_s))
    bt_y = ss * (m_ty + pad_y * (1.0 - m_s))
    if engine == "pallas":
        from ..kernels.resample_pallas import banded_resample_sum

        hs_, ws_ = hist.shape[1], hist.shape[2]
        out = banded_resample_sum(
            hist, m_s.reshape(P, merge), bt_y.reshape(P, merge),
            m_s.reshape(P, merge), bt_x.reshape(P, merge),
            out_h=hs_, out_w=ws_, blocked=True, scale_min=0.8,
            out_dtype=dtype if dtype == jnp.bfloat16 else None,
            interpret=_pallas_interpret())
        return out, centers_super
    res = _resample_hist_affine(hist, m_s, bt_y, m_s, bt_x, dtype=dtype)
    return jnp.sum(res.reshape(P, merge, *res.shape[1:]), axis=1), centers_super


# Butterfly-merge levels at or above this radix run on the fan-in kernel
# (resident parent blocks amortized over many children); below it, the
# (N, K)-grid kernel wins.  Measured crossover on v5e, r5 (see
# _merge_butterfly body).
_FANIN_MIN_RADIX = 8


def _butterfly_radii(S: int) -> list:
    """Radix schedule for S segments: MINIMIZE CASCADE LEVELS first (each
    level costs a hat-blur + frame-change error), then total work
    G*sum(radii), with SMALLER radices FIRST — the first level merges
    adjacent leaves (millimetre frame changes), so specialization-heavy
    high-radix levels run on already-consolidated nodes.  log2(S)
    decomposes into parts of 2 (radix 4) and 3 (radix 8): e.g. S=16 ->
    [4,4] (not [8,2]: same levels, less work), S=32 -> [4,8] (not
    [4,4,2]: one fewer cascade, within1 0.746 -> 0.782 on the BENCH16
    golden window; not [8,4]: 0.768 — low-radix-first wins, r5)."""
    lv = int(np.log2(S))
    threes, rem = divmod(lv, 3)
    if rem == 1:
        # ...3+1 -> ...2+2 (a radix-2 level costs a full cascade for one
        # doubling; trade one radix-8 for two radix-4s instead).
        threes -= 1
        twos = 2
    elif rem == 2:
        twos = 1
    else:
        twos = 0
    if threes < 0:  # lv == 1
        return [2]
    return [4] * twos + [8] * threes


def _frame_change_maps(centers_src, centers_tgt, u_mid, z0, vcam_params,
                       pad_x, pad_y, ss):
    """Bin-coordinate affine maps m = sweep_tgt(u_mid)^-1 o sweep_src(u_mid)
    taking a histogram built in `centers_src`'s sweep frame into
    `centers_tgt`'s, exact at inverse depth u_mid (first-order across a
    segment).  centers_* (N, 3); returns (s, ty, tx) each (N,)."""
    fx, fy, cx, cy = vcam_params
    u = jnp.atleast_1d(jnp.asarray(u_mid, jnp.float32))
    s_l, tx_l, ty_l = _sweep_scale_trans(centers_src, u, z0, fx, fy, cx, cy)
    s_p, tx_p, ty_p = _sweep_scale_trans(centers_tgt, u, z0, fx, fy, cx, cy)
    m_s = (s_l / s_p)[:, 0]
    m_tx = ((tx_l - tx_p) / s_p)[:, 0]
    m_ty = ((ty_l - ty_p) / s_p)[:, 0]
    bt_x = ss * (m_tx + pad_x * (1.0 - m_s))
    bt_y = ss * (m_ty + pad_y * (1.0 - m_s))
    return m_s, bt_y, bt_x


def _merge_butterfly(hist, centers, depths, bounds, z0, vcam_params,
                     pad_x, pad_y, ss, dtype):
    """Hierarchical merge of leaf histograms — the multi-level version of
    the flat `merge_leaf_histograms` pass (the fast-slant-stack butterfly).
    At each level of radix r, r-tuples of adjacent groups merge into a node
    at their mean camera center while the valid inverse-depth range splits
    r ways: after the level, `splits` range-specialized copies of
    G/`splits` nodes exist.  Total merge work is G * sum(radii) resamples
    instead of the flat pass's S*G.

    Radix schedule: radix-4 levels whenever possible, at most one radix-2.
    For the same total work ([4,4] = 8G = [2,2,2,2] at S=16) this halves
    the number of CASCADED resamples, and each cascade level costs both a
    hat-function blur and a frame-change error ~ (node travel x child
    u-half-range) ~ constant per level — so fewer levels is strictly more
    accurate.  Measured on the golden fixture (g8,seg16):
    radix-2 within1 = 0.737, radix-4 = 0.79+ at identical TPU cost.

    Returns (hist_per_segment (S, G/S, hs, ws), centers (G/S, 3)).

    Kernel choice (measured on v5e, r5): the merge runs on the (N, K)-grid
    `banded_resample_sum` — the fan-in variant was tried and is ~45 %
    SLOWER here (5.09 vs 3.49 ms at the bench workload) despite 2.5x less
    HBM input traffic; the stage is bound by in-kernel work (taps + matmul
    + VMEM), which the K-unrolled fan-in body pipelines worse.  The plane
    SWEEP keeps the fan-in kernel (see _sweep_planes_fanin), where holding
    each segment's supergroup block resident wins.
    """
    from ..kernels.resample_pallas import banded_resample_sum

    S = len(bounds) - 1
    G0, hs_, ws_ = hist.shape
    # Pad the leaf axis to a multiple of S so every level pairs evenly.
    pad_g = -G0 % S
    if pad_g:
        hist = jnp.pad(hist, ((0, pad_g), (0, 0), (0, 0)))
        centers = jnp.concatenate(
            [centers, jnp.broadcast_to(centers[-1:], (pad_g, 3))])
    G = hist.shape[0]

    radii = _butterfly_radii(S)

    def block_umid(splits, r):
        """u-midpoint of range r of `splits` (covers S/splits segments).
        Boundaries are static; the value traces with `depths`."""
        per = S // splits
        i0, i1 = bounds[r * per], bounds[(r + 1) * per]
        if i1 <= i0:
            i0, i1 = max(i0 - 1, 0), i0 + 1
        u = 1.0 / depths[i0:i1]
        return 0.5 * (jnp.min(u) + jnp.max(u))

    cur = hist.astype(dtype)               # (R*N, hs, ws), R=1, N=G
    cen = centers                           # (N, 3) — shared across ranges
    R, N = 1, G
    splits = 1
    for radix in radii:
        R_prev, N_prev = R, N
        R, N = radix * R_prev, N_prev // radix
        splits *= radix
        tgt = jnp.mean(cen.reshape(N, radix, 3), axis=1)        # (N, 3)
        tgt_rep = jnp.repeat(tgt, radix, axis=0)                # (N_prev, 3)

        # Each parent range feeds `radix` child ranges, each with its own
        # exactness midpoint.
        sys_, tys_, txs_ = [], [], []
        for r in range(R):
            u_mid_r = block_umid(splits, r)
            m_s, bt_y, bt_x = _frame_change_maps(
                cen, tgt_rep, u_mid_r, z0, vcam_params, pad_x, pad_y, ss)
            sys_.append(m_s)
            tys_.append(bt_y)
            txs_.append(bt_x)

        if radix >= _FANIN_MIN_RADIX:
            # Fan-in kernel: group (q, n) = (parent range, node) holds the
            # radix parents (q*N_prev + radix*n + k, contiguous in standard
            # layout) resident while its radix child ranges j are produced,
            # each scattered straight to standard index (q*radix + j)*N + n.
            # Measured (v5e, r5): WINS for high-radix levels (radix 8:
            # ~2x the (N, K)-grid kernel) where the resident source block
            # amortizes over many children; LOSES at radix 4 (5.1 vs
            # 3.5 ms for the seg16 [4,4] merge).
            from ..kernels.resample_pallas import banded_resample_fanin

            Ngrp = R_prev * N
            qs = np.arange(R_prev)[:, None, None]
            ns = np.arange(N)[None, :, None]
            js = np.arange(radix)[None, None, :]
            out_idx = ((qs * radix + js) * N + ns).reshape(Ngrp, radix)

            def fanin_maps(parts):
                # parts concat over child range rc: value at (rc,
                # parent_flat) with parent_flat = radix*n + k; reorder to
                # (group, j, k).
                a = jnp.concatenate(parts).reshape(R_prev, radix, N, radix)
                return a.transpose(0, 2, 1, 3).reshape(Ngrp, radix, radix)

            cur = banded_resample_fanin(
                cur.reshape(Ngrp, radix, hs_, ws_),
                fanin_maps(sys_), fanin_maps(tys_),
                fanin_maps(sys_), fanin_maps(txs_),
                jnp.asarray(out_idx, jnp.int32),
                n_out=R * N, out_h=hs_, out_w=ws_, scale_min=0.9,
                out_dtype=dtype, interpret=_pallas_interpret())
        else:
            # (N, K)-grid kernel: child (r, n) gathers its radix parents
            # from range r//radix by scalar-prefetched index.
            rs = np.arange(R)[:, None, None]
            ns = np.arange(N)[None, :, None]
            ks = np.arange(radix)[None, None, :]
            src = ((rs // radix) * N_prev
                   + radix * ns + ks).reshape(R * N, radix)
            NK = R * N
            sy = jnp.concatenate(sys_).reshape(NK, radix)
            ty = jnp.concatenate(tys_).reshape(NK, radix)
            tx = jnp.concatenate(txs_).reshape(NK, radix)
            cur = banded_resample_sum(
                cur, sy, ty, sy, tx,
                out_h=hs_, out_w=ws_, blocked=True, scale_min=0.9,
                src=jnp.asarray(src, jnp.int32), out_dtype=dtype,
                interpret=_pallas_interpret())
        cen = tgt
    return cur.reshape(R, N, hs_, ws_), cen


def _pallas_interpret() -> bool:
    """Run the Pallas kernels in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def segment_bounds_equal_u(depths: np.ndarray, segments: int) -> Tuple[int, ...]:
    """Plane-index boundaries splitting the sweep into `segments` chunks of
    approximately equal inverse-depth span.  Host-side (static) helper for
    the `segments` mode; returns a (segments+1)-tuple of indices."""
    d = np.asarray(depths, np.float64)
    u = 1.0 / d
    # Edges walk the sweep in PLANE order (u[0] -> u[-1]), so the same
    # search works for ascending-depth (descending-u, the standard case)
    # and descending-depth sweeps: boundary k is the first plane past the
    # k-th equal-u edge along the sweep direction.
    targets = np.linspace(u[0], u[-1], segments + 1)
    sign = 1.0 if u[-1] >= u[0] else -1.0
    idx = [0]
    for k in range(1, segments):
        pos = int(np.searchsorted(sign * u, sign * targets[k]))
        idx.append(int(np.clip(pos, idx[-1] + 1, len(u) - (segments - k))))
    idx.append(len(u))
    return tuple(idx)


def _affine_coeffs(centers, depths, z0, fx, fy, cx, cy, pad_x, pad_y, ss):
    """Per (group, plane) separable affine map from histogram-bin index to
    output pixel: x_out = p * sx + tx (and y alike).

    Derived from Eq. (15): X' = (X*a + bx)/d with bin p at X = p/ss - pad_x.
    """
    C = centers                      # (G, 3)
    zi = depths[None, :]             # (1, Z)
    a = z0 * (zi - C[:, 2:3])        # (G, Z)
    bx = (z0 - zi) * (C[:, 0:1] * fx + C[:, 2:3] * cx)
    by = (z0 - zi) * (C[:, 1:2] * fy + C[:, 2:3] * cy)
    d = zi * (z0 - C[:, 2:3])
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    sx = a / (d * ss)
    tx = (bx - pad_x * a) / d
    sy = a / (d * ss)
    ty = (by - pad_y * a) / d
    return sx, tx, sy, ty


def splat_hist(
    packets: WarpedPackets,
    depths: jnp.ndarray,
    z0: float,
    vcam_params: Tuple[float, float, float, float],
    width: int,
    height: int,
    plane_block: int = 8,
    group_size: int = 32,
    supersample: int = 1,
    pad_x: int = 128,
    pad_y: int = 32,
    dtype=jnp.bfloat16,
    correct: bool = True,
    segments: int = 1,
    seg_bounds: Optional[Tuple[int, ...]] = None,
    bin_dtype=None,
    engine: str = "xla",
    merge_mode: str = "flat",
    corr_u_mid=None,
    weights_binary: bool = False,
) -> jnp.ndarray:
    """Vote all packets into a (Z, H, W) DSI by histogram + affine resample.

    `group_size` packets share one camera center (1 = per-packet exact);
    `pad_x`/`pad_y` extend the z0 grid so events whose z0 location is out of
    frame still vote on planes where they land in frame (the disparity sweep
    reaches ~f*baseline/min_depth pixels); `supersample` refines the bin
    grid to tighten the effective splat kernel; `dtype` is the matmul input
    precision (f32 accumulation either way).

    `segments` > 1 splits the inverse-depth sweep into that many chunks
    (boundaries `seg_bounds`, a static index tuple — equal plane counts if
    None; use `segment_bounds_equal_u` for equal-u chunks).  Within a chunk
    the map varies `segments`x less, so `segments`x more packets can share a
    camera center at the same accuracy: leaf histograms at `group_size` are
    merged into supergroups of `segments` leaves per chunk
    (`merge_leaf_histograms`), cutting the per-plane resample work from
    G x Z to ~G x Z / segments + G x segments merges.  This is a flat
    two-level version of the fast-slant-stack butterfly;
    `merge_mode="butterfly"` (pallas engine, power-of-two segments) runs
    the full multi-level tree — O(G log S) merges instead of O(G S), at
    the cost of ~sqrt(log2 S)/ss bins of extra resample blur.
    """
    fx, fy, cx, cy = vcam_params
    ss = supersample
    hs = (height + 2 * pad_y) * ss
    ws = (width + 2 * pad_x) * ss
    if engine == "pallas" and not _pallas_interpret() \
            and _pallas_hist_vmem_bytes(hs, ws) > _VMEM_BUDGET_BYTES:
        # VMEM feasibility on real TPUs: a 2x-supersampled DSEC grid
        # (1088 x 1792 padded, ~7.8 MB/block -> ~22 MB scoped) fails TPU
        # AOT compilation outright; degrade the whole spec to the XLA
        # engine (identical binning/sweep math, one-hot matmuls on the
        # MXU, but ~4x the histogram work) rather than crash.  Butterfly
        # merging exists only in the Pallas engine, so it degrades with it.
        est = _pallas_hist_vmem_bytes(hs, ws)
        logger.warning(
            "splat_hist: pallas engine degraded to XLA — the (%d, %d) "
            "histogram grid needs ~%.1f MB of scoped VMEM (budget %.0f MB); "
            "expect ~4x the histogram-stage work. Reduce `supersample` or "
            "`pad_x`/`pad_y` to stay on the Pallas engine.",
            hs, ws, est / 2**20, _VMEM_BUDGET_BYTES / 2**20)
        engine = "xla"
        if merge_mode == "butterfly":
            logger.warning(
                "splat_hist: butterfly merge needs the Pallas engine — "
                "falling back to the flat segmented merge (O(G*S) resamples "
                "instead of O(G log S)).")
            merge_mode = "flat"
    if engine == "pallas":
        # Lane/sublane alignment for the banded kernel, plus 64-row strip
        # alignment for the windowed binning kernel: extend the grid at the
        # right/bottom edge only (extra bins are simply never mapped).
        ws += -ws % 128
        hs += -hs % 64
    Z = depths.shape[0]

    u_all = 1.0 / jnp.asarray(depths)
    # `corr_u_mid` overrides the correction midpoint — plane-sharded runs
    # pass the GLOBAL sweep midpoint so every shard bins identically and
    # the sharded DSI matches the single-device one bit-near.
    u_mid = 0.5 * (jnp.min(u_all) + jnp.max(u_all)) \
        if corr_u_mid is None else corr_u_mid
    corr = (z0, fx, fy, cx, cy, u_mid) if correct else None
    hist, centers = build_group_histograms(
        packets, group_size, hs, ws, pad_x, pad_y, ss,
        dtype=bin_dtype if bin_dtype is not None else dtype,
        correction=corr, engine=engine,
        out_dtype=dtype if engine == "pallas" else None,
        weights_binary=weights_binary)
    hist = hist.astype(dtype)

    if segments > 1:
        # Plane-sharded runs sweep small z-blocks: clamp the segment count
        # to the planes actually present (butterfly stays a power of two).
        eff = min(segments, Z)
        if merge_mode == "butterfly":
            eff = 1 << (eff.bit_length() - 1)
        if eff != segments:
            segments, seg_bounds = eff, None
    if segments > 1:
        if seg_bounds is None:
            bounds = [round(s * Z / segments) for s in range(segments + 1)]
        else:
            bounds = list(seg_bounds)
        if merge_mode == "butterfly":
            if engine != "pallas" or segments & (segments - 1):
                raise ValueError(
                    "merge_mode='butterfly' needs the pallas engine and a "
                    f"power-of-two segment count (got {engine}, {segments})")
            hist_seg, centers_s = _merge_butterfly(
                hist, centers, depths, bounds, z0, vcam_params,
                pad_x, pad_y, ss, dtype)
            if all(bounds[s] < bounds[s + 1] for s in range(segments)):
                return _sweep_planes_fanin(
                    hist_seg, centers_s, depths, bounds, z0, vcam_params,
                    width, height, pad_x, pad_y, ss)
            parts = []
            for s in range(segments):
                i0, i1 = bounds[s], bounds[s + 1]
                if i0 >= i1:
                    continue
                parts.append(_sweep_planes(
                    hist_seg[s].astype(dtype), centers_s, depths[i0:i1], z0,
                    vcam_params, width, height, pad_x, pad_y, ss,
                    min(plane_block, i1 - i0), dtype, engine))
            return jnp.concatenate(parts, axis=0)
        parts = []
        for s in range(segments):
            i0, i1 = bounds[s], bounds[s + 1]
            if i0 >= i1:
                continue
            dseg = depths[i0:i1]
            useg = 1.0 / dseg
            u_mid_s = 0.5 * (jnp.min(useg) + jnp.max(useg))
            hist_s, centers_s = merge_leaf_histograms(
                hist, centers, segments, u_mid_s, z0, vcam_params,
                pad_x, pad_y, ss, dtype=dtype, engine=engine)
            parts.append(_sweep_planes(
                hist_s.astype(dtype), centers_s, dseg, z0, vcam_params,
                width, height, pad_x, pad_y, ss,
                min(plane_block, i1 - i0), dtype, engine))
        return jnp.concatenate(parts, axis=0)

    return _sweep_planes(hist, centers, depths, z0, vcam_params, width,
                         height, pad_x, pad_y, ss, plane_block, dtype, engine)


def _sweep_planes_fanin(hist_seg, centers_s, depths, bounds, z0, vcam_params,
                        width, height, pad_x, pad_y, ss):
    """Fetch-deduplicated plane sweep over the butterfly's range-specialized
    supergroups: ONE fan-in kernel call sweeps every segment, holding each
    segment's (K, hs, ws) histogram block resident across its planes
    (`banded_resample_sum` re-fetches every block once per plane — at DSEC
    dims that is Z*K ~ 400 MB of redundant HBM reads).  Ragged segments are
    padded with clamped-duplicate plane indices (idempotent recompute of
    the segment's last plane).  Requires every segment non-empty."""
    from ..kernels.resample_pallas import banded_resample_fanin

    fx, fy, cx, cy = vcam_params
    S = hist_seg.shape[0]
    Z = depths.shape[0]
    sx, tx, sy, ty = _affine_coeffs(
        centers_s, depths, z0, fx, fy, cx, cy, pad_x, pad_y, ss)  # (K, Z)
    seg_lens = [bounds[s + 1] - bounds[s] for s in range(S)]
    M = max(seg_lens)
    pidx = np.stack([np.minimum(bounds[s] + np.arange(M), bounds[s + 1] - 1)
                     for s in range(S)])                          # (S, M)
    pidx_j = jnp.asarray(pidx, jnp.int32)

    def gath(c):  # (K, Z) -> (S, M, K)
        return c[:, pidx_j].transpose(1, 2, 0)

    w_pad = width + (-width % 128)
    out = banded_resample_fanin(
        hist_seg, gath(sy), gath(ty), gath(sx), gath(tx), pidx_j,
        n_out=Z, out_h=height, out_w=w_pad,
        tile_v=128 // ss, scale_min=(2.0 / 3.0) / ss,
        interpret=_pallas_interpret())
    return out[:, :, :width]


def _sweep_planes(hist, centers, depths, z0, vcam_params, width, height,
                  pad_x, pad_y, ss, plane_block, dtype, engine="xla"):
    """Per-plane banded affine resample + sum over groups (steps 3 of the
    module docstring): DSI[zi] = sum_g Ry_g^T @ hist_g @ Cx_g."""
    fx, fy, cx, cy = vcam_params
    Z = depths.shape[0]
    G, hs, ws = hist.shape
    sx, tx, sy, ty = _affine_coeffs(
        centers, depths, z0, fx, fy, cx, cy, pad_x, pad_y, ss)

    if engine == "pallas":
        from ..kernels.resample_pallas import banded_resample_sum

        w_pad = width + (-width % 128)
        # Sweep scale = (a/d)/ss with a/d >= 2/3 for any camera advancing
        # less than min_depth/3 within a chunk (see kernel docstring).
        out = banded_resample_sum(
            hist, sy.T, ty.T, sx.T, tx.T,
            out_h=height, out_w=w_pad, blocked=False,
            tile_v=128 // ss, scale_min=(2.0 / 3.0) / ss,
            interpret=_pallas_interpret())
        return out[:, :, :width]

    nblocks = -(-Z // plane_block)
    padz = nblocks * plane_block - Z

    def to_blocks(c):  # (G, Z) -> (nblocks, G, ZB)
        c = jnp.pad(c, ((0, 0), (0, padz)), constant_values=1.0)
        return jnp.moveaxis(c.reshape(G, nblocks, plane_block), 1, 0)

    sxb, txb, syb, tyb = (to_blocks(c) for c in (sx, tx, sy, ty))

    vout = jnp.arange(height, dtype=jnp.float32)
    uout = jnp.arange(width, dtype=jnp.float32)
    qrow = jnp.arange(hs, dtype=jnp.float32)
    prow = jnp.arange(ws, dtype=jnp.float32)

    def one_block(args):
        sxg, txg, syg, tyg = args   # each (G, ZB)

        def one_group(acc, g):
            # Banded resample matrices for this group's ZB planes:
            # Ry[z, q, v] = hat(q*sy + ty - v), Cx[z, p, u] = hat(p*sx+tx-u).
            y_map = qrow[None, :, None] * syg[g][:, None, None] + tyg[g][:, None, None]
            ry = jnp.maximum(0.0, 1.0 - jnp.abs(y_map - vout[None, None, :]))
            x_map = prow[None, :, None] * sxg[g][:, None, None] + txg[g][:, None, None]
            cxm = jnp.maximum(0.0, 1.0 - jnp.abs(x_map - uout[None, None, :]))
            resy = jax.lax.dot_general(        # (ZB, H, ws) = Ry^T @ hist_g
                ry.astype(dtype), hist[g],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(     # (ZB, H, W) = resy @ Cx
                resy.astype(dtype), cxm.astype(dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return acc + contrib, None

        acc0 = jnp.zeros((sxg.shape[1], height, width), jnp.float32)
        acc, _ = jax.lax.scan(one_group, acc0, jnp.arange(G))
        return acc

    blocks = jax.lax.map(one_block, (sxb, txb, syb, tyb))
    return blocks.reshape(-1, height, width)[:Z]


def auto_group_size(
    travel_m: float,
    num_packets: int,
    fx: float,
    min_depth: float,
    max_depth: float,
    tol_px: float = 1.0,
    corrected: bool = True,
) -> int:
    """Largest power-of-two packet grouping keeping the grouping error under
    `tol_px` at the depth-sweep extremes.

    Vote-position sensitivity to camera-center error is
    |dX'/dC| ~ fx * (1/min_depth - 1/max_depth); a group spanning
    `spread` metres of camera travel displaces votes by up to
    spread/2 * sensitivity (halved again by the first-order sweep
    correction).  Powers of two bound jit recompiles across chunks.
    """
    if num_packets <= 1 or travel_m <= 0:
        return max(1, num_packets)
    sens = fx * abs(1.0 / min_depth - 1.0 / max_depth)
    corr_gain = 4.0 if corrected else 2.0
    spread_tol = corr_gain * tol_px / max(sens, 1e-9)
    per_packet = travel_m / num_packets
    g = max(1, int(spread_tol / max(per_packet, 1e-12)))
    return 1 << min(int(g).bit_length() - 1, 10)


def auto_backend_spec(
    chunk_travel_m: float,
    n_packets: int,
    fx: float,
    min_depth: float,
    max_depth: float,
    dim_z: int,
    use_pallas: bool,
) -> str:
    """The production backend spec the CLI auto-selects (one definition so
    the CLI, the benchmark, and the golden accuracy gates all exercise the
    same path): MXU histogram voting with a travel-bounded group size, an
    inverse-depth-segmented sweep, and — on TPU — the Pallas engine with
    the O(G log S) butterfly merge (no supersampling: VMEM-infeasible at
    production dims, see body).  Off-TPU the spec instead adds 2x
    supersampling (accuracy-first; no VMEM constraint)."""
    g = auto_group_size(chunk_travel_m, n_packets, fx, min_depth, max_depth)
    spec = f"hist:g{g}"
    # Segment the inverse-depth sweep when there are enough planes to
    # amortize the leaf merges; with the Pallas engine, power-of-two
    # segment counts take the O(G log S) butterfly merge.
    segs = min(16, dim_z // 10)
    if use_pallas:
        # Measured on TPU v5e at DSEC dims (640x480x100, 1 Mi events,
        # r5 duration-targeted loops): seg16 116.3 Mev/s vs seg32 95.9-107.5
        # across all radix schedules and kernel variants — round the
        # segment count UP to the next power of two, capped at 16.  (The
        # r3/r4 "seg32 wins" signal came from the alternatives row's
        # 5-iteration timing loops, which the tunnel's 25-140 ms dispatch
        # RTT dominates; the settled call and the schedule/kernel sweep
        # behind it are in docs/performance.md.)  And no 2x supersampling:
        # the supersampled grid blows the Pallas kernels' scoped-VMEM
        # budget (splat_hist degrades such specs to the XLA engine, ~4x
        # the histogram work — both slower and pointless); accuracy of the
        # ss1+seg16 spec is gated by tests/test_golden*.py within the same
        # budget.
        if segs >= 2:
            segs = min(16, 1 << (segs - 1).bit_length())
    else:
        spec += ",ss2"
    if segs >= 2:
        spec += f",seg{segs}"
        if use_pallas:
            spec += ",bf"
    if use_pallas:
        spec += ",pl"
    return spec


def make_hist_backend(group_size: int = 32, supersample: int = 1,
                      pad_x: int = 128, pad_y: int = 32,
                      dtype=jnp.bfloat16, correct: bool = True,
                      segments: int = 1,
                      seg_bounds: Optional[Tuple[int, ...]] = None,
                      bin_dtype=None, engine: str = "xla",
                      merge_mode: str = "flat"):
    """A SPLAT_BACKENDS-compatible callable with fixed histogram knobs."""
    return functools.partial(
        splat_hist, group_size=group_size, supersample=supersample,
        pad_x=pad_x, pad_y=pad_y, dtype=dtype, correct=correct,
        segments=segments, seg_bounds=seg_bounds, bin_dtype=bin_dtype,
        engine=engine, merge_mode=merge_mode)
