"""Roofline / MFU accounting of the DSI voting hot path on the real chip.

Answers VERDICT r4's open question: how far does the shipped voting spec sit
from this chip's ceiling, and which stage is bound by what?  For each stage
of the hist/pl path (warp, row sort, windowed binning, butterfly merge,
plane sweep) this script:

  1. times the stage on-device with DURATION-TARGETED loops (the tunnel's
     dispatch RTT is tens of ms and varies; every timed region is sized to
     >= `--min-time` seconds so the single RTT subtraction is noise),
  2. computes an analytic work model — MXU MACs and HBM bytes — from the
     spec and the actual event data (strip counts are data-dependent),
  3. measures the chip's ACHIEVABLE peaks (large bf16 matmul, large HBM
     copy) rather than quoting datasheet numbers, and
  4. reports per stage: achieved TFLOP/s, GB/s, %-of-peak on each resource,
     the roofline bound time max(flops/peak, bytes/bw), and the headroom
     ratio measured/bound.

The reference has no analog (its kernel is a scalar OpenMP scatter,
mapper_emvs_stereo.cpp:151-205); this is the "actually fast, not just past
the target" audit of its TPU replacement.

Usage: python scripts/roofline.py [--spec hist:g16,seg16,bf,pl] [--json out]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BF16_FLOPS_PER_MAC = 2


def _force(out):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return float(out[(0,) * out.ndim])


def make_timer(min_time: float):
    """min-of-3 duration-targeted timer: each timed region runs enough
    iterations that the dispatch+readback RTT (subtracted once) is < ~2 %
    of the region."""
    import bench

    rtt = bench._tunnel_rtt()

    def timeit(fn, args, min_time=min_time, max_iters=3000):
        out = fn(*args)
        _force(out)  # compile + settle
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        dt0 = max(time.perf_counter() - t0 - rtt, 1e-5)
        iters = int(np.clip(math.ceil(min_time / dt0), 5, max_iters))
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            _force(out)
            runs.append((time.perf_counter() - t0 - rtt) / iters)
        return max(min(runs), 1e-9)

    return timeit, rtt


def measure_peaks(timeit):
    """Achievable (not datasheet) peaks: a large square bf16 matmul for the
    MXU, a large elementwise add for HBM read+write bandwidth."""
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                    jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)),
                    jnp.bfloat16)
    mm = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dt = timeit(mm, (a, b))
    peak_tflops = 2 * n ** 3 / dt / 1e12

    m = 64 * 2 ** 20  # 256 MB f32
    v = jnp.zeros((m,), jnp.float32)
    add = jax.jit(lambda v: v + 1.0)
    dt = timeit(add, (v,))
    peak_gbs = 2 * m * 4 / dt / 1e9
    return peak_tflops, peak_gbs


def stage_models(spec_kw, *, width, height, dim_z, n_events, packet,
                 strips_mean):
    """Analytic MACs + HBM bytes per stage of the hist/pl path.

    Mirrors the actual kernel shapes (ops/voting_hist.py,
    kernels/binning_pallas.py, kernels/resample_pallas.py):
      * binning: windowed kernel, per event block one (strips*WH, EB)
        x (ws, EB)^T matmul; `strips_mean` comes from the real sorted data.
      * merge: butterfly levels radix-4 (at most one radix-2) on the
        (N, K)-grid kernel — each child fetches its radix parent blocks
        (a fan-in variant fetching each parent once was measured SLOWER;
        the stage is in-kernel-bound, see _merge_butterfly docstring).
      * sweep: fan-in kernel — each segment's (K, hs, ws) supergroup block
        is fetched once and stays resident across its planes; ragged
        segments pad to ceil(Z/S) planes with idempotent duplicates.
    Tap-construction VPU work is reported separately (vpu_ops) — it rides
    the roofline as neither MACs nor HBM.
    """
    g = spec_kw["group"]
    S = spec_kw["segments"]
    pad_x, pad_y, ss = 128, 32, 1
    hs = (height + 2 * pad_y) * ss
    ws = (width + 2 * pad_x) * ss
    ws += -ws % 128
    hs += -hs % 64
    G = n_events // packet // g
    EB, WH = 1024, 64
    n_blocks = n_events // EB

    def resample_cost(Ho, Wo, scale_min, tile_v=128, tile_u=128):
        TV = min(Ho, tile_v) - min(Ho, tile_v) % 8
        TU = min(Wo, tile_u) - min(Wo, tile_u) % 128
        qv = math.ceil(TV / scale_min) + 24
        QV = min(hs, qv + (-qv % 8))
        qu = math.ceil(TU / scale_min) + 24
        QU = min(ws, qu + (-qu % 128))
        n_vt = -(-Ho // TV)
        n_ut = Wo // TU
        y_macs = n_vt * QV * TV * ws
        x_macs = n_ut * QU * TU * Ho
        vpu = (n_vt * QV * TV + n_ut * QU * TU) * 4
        return y_macs + x_macs, vpu

    # --- binning ----------------------------------------------------------
    sort_bytes = 2 * 4 * n_events * 2  # 2 payloads, ~1 r/w HBM round trip
    bin_macs = n_blocks * strips_mean * WH * EB * ws
    bin_vpu = n_blocks * EB * (ws + strips_mean * WH) * 4
    bin_bytes = (2 * 4 * n_events            # hx, hy in
                 + G * hs * ws * 2)          # bf16 hist out

    # --- butterfly merge --------------------------------------------------
    from dvs_mcemvs_tpu.ops.voting_hist import _butterfly_radii

    radii = _butterfly_radii(S)
    mg_macs = mg_bytes = mg_vpu = 0
    per_resample, per_vpu = resample_cost(hs, ws, scale_min=0.9)
    for radix in radii:
        n_resamples = radix * G  # G children per level, radix parents each
        mg_macs += n_resamples * per_resample
        mg_vpu += n_resamples * per_vpu
        mg_bytes += (n_resamples * hs * ws * 2   # parent fetch per child
                     + G * hs * ws * 2)          # level output
    # --- sweep ------------------------------------------------------------
    K = max(G // S, 1)
    w_pad = width + (-width % 128)
    planes = S * -(-dim_z // S)                  # ragged-segment padding
    per_resample, per_vpu = resample_cost(height, w_pad, scale_min=2.0 / 3.0)
    sw_macs = planes * K * per_resample
    sw_vpu = planes * K * per_vpu
    sw_bytes = (G * hs * ws * 2                  # each supergroup block once
                + planes * height * w_pad * 4)   # f32 DSI out (incl. dups)

    warp_bytes = (3 * 4 * n_events               # x, y, t in
                  + 2 * 4 * n_events)            # xy_z0 out
    return {
        "grid": [hs, ws], "leaves": G, "radii": radii,
        "warp": {"macs": 0, "bytes": warp_bytes, "vpu_ops": 30 * n_events},
        "sort": {"macs": 0, "bytes": sort_bytes, "vpu_ops": 0},
        "binning": {"macs": bin_macs, "bytes": bin_bytes, "vpu_ops": bin_vpu},
        "merge": {"macs": mg_macs, "bytes": mg_bytes, "vpu_ops": mg_vpu},
        "sweep": {"macs": sw_macs, "bytes": sw_bytes, "vpu_ops": sw_vpu},
    }


def build_stages(spec):
    """Jitted callables for each stage at the bench workload (private-API
    mirror of splat_hist's pallas path, same structure as
    scripts/profile_vote_stages.py)."""
    import jax
    import jax.numpy as jnp

    import bench
    from dvs_mcemvs_tpu.ops import camera as camops, voting
    from dvs_mcemvs_tpu.ops import voting_hist as vh

    kw = {"group": 16, "segments": 16}
    for tok in spec.partition(":")[2].split(","):
        if tok.startswith("seg"):
            kw["segments"] = int(tok[3:])
        elif tok[0] == "g" and tok[1:].isdigit():
            kw["group"] = int(tok[1:])
    group, segments = kw["group"], kw["segments"]

    mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))
    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    fx, fy, cx, cy = vp
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    rect_params = camops.rect_static(mapper.cam)
    pad_x, pad_y, ss = 128, 32, 1
    hs = (mapper.height + 2 * pad_y) * ss
    ws = (mapper.width + 2 * pad_x) * ss
    ws += -ws % 128
    hs += -hs % 64

    @jax.jit
    def warp(x, y, t):
        return voting.warp_events_to_z0(
            x, y, t, traj, T_rv_w, None, K_cam, Kv_inv, z0=z0,
            width=mapper.width, packet_size=bench.PACKET, full=True,
            rect_params=rect_params)

    packets = warp(*dev_args)
    u_all = 1.0 / depths
    u_mid = 0.5 * (jnp.min(u_all) + jnp.max(u_all))

    # The windowed kernel's exact inputs, reproduced so the row sort can be
    # timed in isolation (it runs inside the binning jit otherwise).
    def bin_inputs(packets):
        K_, P_, _ = packets.xy_z0.shape
        G_ = -(-K_ // group)
        Eg = group * P_
        pw = packets.event_weights().reshape(K_, P_)
        xy = packets.xy_z0
        dx, dy = vh._sweep_correction(
            xy, packets.centers, vh._group_centers(packets, group), group,
            z0, fx, fy, cx, cy, u_mid)
        hx = ((xy[..., 0] + dx + pad_x) * ss).reshape(G_, Eg)
        hy = ((xy[..., 1] + dy + pad_y) * ss).reshape(G_, Eg)
        w = pw.reshape(G_, Eg)
        inb = (hx >= 0) & (hx <= ws - 1) & (hy >= 0) & (hy <= hs - 1)
        w = jnp.where(inb, w, 0.0)
        hx = jnp.where(w > 0, jnp.clip(hx, 0.0, ws - 1), -2.0)
        hy = jnp.clip(hy, 0.0, hs - 1)
        return hx, hy

    @jax.jit
    def sort_only(packets):
        hx, hy = bin_inputs(packets)
        # mirrors bin_events_pallas_windowed's unstable sort (r5)
        return jax.lax.sort((hy, hx), dimension=1, num_keys=1,
                            is_stable=False)

    @jax.jit
    def binning(packets):
        h, c = vh.build_group_histograms(
            packets, group, hs, ws, pad_x, pad_y, ss, dtype=jnp.bfloat16,
            correction=(z0, fx, fy, cx, cy, u_mid), engine="pallas",
            out_dtype=jnp.bfloat16)
        return h, c

    hist, centers = binning(packets)
    Z = int(depths.shape[0])
    bounds = [round(s * Z / segments) for s in range(segments + 1)]

    @jax.jit
    def merge(hist, centers):
        return vh._merge_butterfly(hist, centers, depths, bounds, z0, vp,
                                   pad_x, pad_y, ss, jnp.bfloat16)

    hist_seg, centers_s = merge(hist, centers)

    @jax.jit
    def sweep(hist_seg, centers_s):
        return vh._sweep_planes_fanin(
            hist_seg, centers_s, depths, bounds, z0, vp,
            mapper.width, mapper.height, pad_x, pad_y, ss)

    full = bench.make_step(mapper, traj, T_rv_w, spec, 7)

    # Data-dependent strip count for the binning model.
    hy_s, hx_s = sort_only(packets)
    hy_np = np.asarray(hy_s).reshape(-1, 1024)
    first = np.floor(hy_np[:, 0]).astype(int)
    last = np.floor(hy_np[:, -1]).astype(int) + 1
    strips_mean = float(np.mean(last // 64 - first // 64 + 1))

    stages = {
        "warp": (warp, dev_args),
        "sort": (sort_only, (packets,)),
        "binning": (binning, (packets,)),
        "merge": (merge, (hist, centers)),
        "sweep": (sweep, (hist_seg, centers_s)),
        "full": (full, dev_args),
    }
    meta = {"group": group, "segments": segments, "strips_mean": strips_mean,
            "mapper": mapper}
    return stages, meta


def run(spec="hist:g16,seg16,bf,pl", min_time=1.5, skip_peaks=False):
    """Measure + model; returns the report dict (bench.py embeds a condensed
    version as its `mfu` detail block)."""
    import jax

    import bench

    timeit, rtt = make_timer(min_time)
    print(f"device={jax.default_backend()} rtt={rtt*1e3:.1f} ms",
          file=sys.stderr)

    if skip_peaks:
        peak_tflops, peak_gbs = 182.9, 659.0  # this chip, measured 2026-08
    else:
        peak_tflops, peak_gbs = measure_peaks(timeit)
    print(f"peaks: {peak_tflops:.1f} TFLOP/s bf16, {peak_gbs:.0f} GB/s",
          file=sys.stderr)

    stages, meta = build_stages(spec)
    models = stage_models(
        {"group": meta["group"], "segments": meta["segments"]},
        width=bench.WIDTH, height=bench.HEIGHT, dim_z=bench.DIM_Z,
        n_events=bench.N_EVENTS, packet=bench.PACKET,
        strips_mean=meta["strips_mean"])

    rows = {}
    for name, (fn, fargs) in stages.items():
        dt = timeit(fn, fargs)
        row = {"ms": round(dt * 1e3, 3)}
        if name in models:
            m = models[name]
            flops = m["macs"] * BF16_FLOPS_PER_MAC
            t_flop = flops / (peak_tflops * 1e12)
            t_mem = m["bytes"] / (peak_gbs * 1e9)
            bound = max(t_flop, t_mem)
            row.update({
                "model_gflop": round(flops / 1e9, 1),
                "model_gb": round(m["bytes"] / 1e9, 3),
                "model_vpu_gops": round(m["vpu_ops"] / 1e9, 2),
                "achieved_tflops": round(flops / dt / 1e12, 1),
                "achieved_gbs": round(m["bytes"] / dt / 1e9, 1),
                "pct_peak_mxu": round(100 * flops / dt / 1e12 / peak_tflops, 1),
                "pct_peak_hbm": round(100 * m["bytes"] / dt / 1e9 / peak_gbs, 1),
                "bound": "mxu" if t_flop >= t_mem else "hbm",
                "bound_ms": round(bound * 1e3, 3),
                "headroom_x": round(dt / max(bound, 1e-9), 2),
            })
        rows[name] = row
        print(f"{name:8s} {row}", file=sys.stderr)

    staged = ["sort", "binning", "merge", "sweep"]  # sort rides inside binning
    vote_bound_ms = (rows["binning"]["bound_ms"] + rows["merge"]["bound_ms"]
                     + rows["sweep"]["bound_ms"]
                     + rows["sort"]["ms"])  # sort has no tight model: measured
    report = {
        "device": str(jax.devices()[0]),
        "spec": spec,
        "workload": {"events": bench.N_EVENTS,
                     "dsi": [bench.DIM_Z, bench.HEIGHT, bench.WIDTH],
                     "grid": models["grid"], "leaves": models["leaves"],
                     "butterfly_radii": models["radii"],
                     "strips_mean": round(meta["strips_mean"], 2)},
        "peaks": {"bf16_tflops": round(peak_tflops, 1),
                  "hbm_gbs": round(peak_gbs, 1),
                  "method": "measured: 8192^3 bf16 matmul / 256 MB f32 add"},
        "stages": rows,
        "summary": {
            "full_step_ms": rows["full"]["ms"],
            "full_step_mev_s": round(
                bench.N_EVENTS / (rows["full"]["ms"] / 1e3) / 1e6, 1),
            "vote_bound_ms": round(vote_bound_ms, 3),
            "vote_bound_mev_s": round(
                bench.N_EVENTS / (vote_bound_ms / 1e3) / 1e6, 1),
            "headroom_x": round(rows["full"]["ms"] / vote_bound_ms, 2),
            "note": "bound = sum over stages of max(model FLOPs / measured "
                    "peak, model bytes / measured BW); sort enters at its "
                    "measured time (comparison sort has no tight "
                    "FLOP/byte bound)",
        },
    }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="hist:g16,seg16,bf,pl")
    ap.add_argument("--min-time", type=float, default=1.5,
                    help="seconds per timed region (RTT noise floor)")
    ap.add_argument("--json", default="",
                    help="write the report to this path as JSON")
    ap.add_argument("--skip-peaks", action="store_true",
                    help="reuse cached peak numbers (debugging)")
    args = ap.parse_args(argv)
    report = run(spec=args.spec, min_time=args.min_time,
                 skip_peaks=args.skip_peaks)
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
