"""Headline benchmark: DSI voting throughput (Mevents/s) on one chip.

Measures the framework's hot kernel — event warp + depth-plane voting into a
DSEC-sized DSI (640x480x100, the workload of
cfg/DSEC/interlaken_00_b_2/dsec.conf in the reference) — against the
driver-set target of 100 Mev/s per chip (BASELINE.md).  The reference
instruments the same number via its Mev/s log (process1.cpp:82-86).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MEV_S = 100.0

WIDTH, HEIGHT, DIM_Z = 640, 480, 100
N_EVENTS = 1_048_576  # 1 Mi events, packet-aligned
PACKET = 1024


def build_workload():
    import jax.numpy as jnp

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import DsiShape, make_mapper
    from dvs_mcemvs_tpu.ops.camera import PinholeCamera
    from dvs_mcemvs_tpu.ops import trajectory as trajmod
    from dvs_mcemvs_tpu.utils import synthetic

    cam = PinholeCamera(width=WIDTH, height=HEIGHT, fx=WIDTH * 0.9,
                        fy=WIDTH * 0.9, cx=WIDTH / 2, cy=HEIGHT / 2)
    rig = synthetic.SyntheticRig(cam=cam, baseline=0.6, travel=0.5,
                                 plane_depths=(4.0, 12.0))
    mapper = make_mapper(cam, DsiShape(dim_z=DIM_Z, min_depth=2.0,
                                       max_depth=40.0))

    rng = np.random.default_rng(1)
    pts = synthetic.make_scene(rig, rng, 40_000)
    ev = synthetic.simulate_events(rig, pts, 0, n_samples=40, rng=rng)
    # Tile the stream up to the fixed benchmark size (timestamps keep order
    # inside each tile; throughput is content-independent).
    reps = -(-N_EVENTS // ev.num)
    x = np.tile(ev.x, reps)[:N_EVENTS]
    y = np.tile(ev.y, reps)[:N_EVENTS]
    t = np.sort(np.tile(ev.t, reps)[:N_EVENTS], kind="stable")

    ts, q, p = synthetic.rig_poses(rig)
    traj = trajmod.from_arrays(ts, q, p)
    T_rv_w = pipeline.place_reference_view(traj, 0.5)
    return mapper, (x, y, t), traj, T_rv_w


def make_full_chunk_step(mapper, traj, T_rv_w, backend, plane_block):
    """End-to-end process_1 chunk on device: warp -> vote (2 cameras) ->
    HM fusion -> collapse -> extraction, the span the reference's Mev/s log
    actually times (process1.cpp:82-86 wraps the whole evaluateDSI + fusion;
    extraction follows in getDepthMapFromDSI).  Both cameras consume the
    same event buffers with baseline-offset trajectories — throughput is
    content-independent; 2 x N_EVENTS are processed per step."""
    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import (camera as camops, extract,
                                    grid as gridops,
                                    trajectory as trajmod, voting)
    from dvs_mcemvs_tpu.ops.se3 import SE3

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    traj_ts, traj_q = traj.ts, traj.poses.q
    traj_t0 = traj.poses.t
    traj_t1 = traj.poses.t + jnp.asarray([0.6, 0.0, 0.0], traj.poses.t.dtype)
    rv_q, rv_t = T_rv_w.q, T_rv_w.t
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)
    opts = extract.DepthMapOptions()

    @jax.jit
    def step(x, y, t):
        dsis = []
        for tt in (traj_t0, traj_t1):
            trj = trajmod.Trajectory(traj_ts, SE3(traj_q, tt))
            packets = voting.warp_events_to_z0(
                x, y, t, trj, SE3(rv_q, rv_t), None, K_cam, Kv_inv,
                z0=z0, width=mapper.width, packet_size=PACKET, full=True,
                rect_params=rect_params,
            )
            dsis.append(splat(packets, depths, z0, vp, mapper.width,
                              mapper.height, plane_block=plane_block))
        fused = gridops.fuse_many(dsis, gridops.FUSE_HM)
        res = extract.get_depth_map_from_dsi(fused, mapper.depth_vec, opts)
        return res.depth

    return step


def make_alg2_step(mapper, traj, T_rv_w, backend, plane_block, n_sub=2):
    """process_2 chunk on device — the temporal flagship (VERDICT r4 item
    7): each of `n_sub` equal-event sub-intervals is voted per camera and
    camera-fused (HM), the sub-interval results stream into the temporal
    HM accumulator, then collapse + extraction.  The span the reference
    times for algorithm 2 (process2.cpp:95-96,193-194).  2 x N_EVENTS are
    processed per step (every event votes once, as in process_2)."""
    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import (camera as camops, extract,
                                    grid as gridops,
                                    trajectory as trajmod, voting)
    from dvs_mcemvs_tpu.ops.se3 import SE3

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    traj_ts, traj_q = traj.ts, traj.poses.q
    traj_t0 = traj.poses.t
    traj_t1 = traj.poses.t + jnp.asarray([0.6, 0.0, 0.0], traj.poses.t.dtype)
    rv_q, rv_t = T_rv_w.q, T_rv_w.t
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)
    opts = extract.DepthMapOptions()
    per = N_EVENTS // n_sub

    @jax.jit
    def step(x, y, t):
        acc = None
        for k in range(n_sub):
            sl = slice(k * per, (k + 1) * per)
            dsis = []
            for tt in (traj_t0, traj_t1):
                trj = trajmod.Trajectory(traj_ts, SE3(traj_q, tt))
                packets = voting.warp_events_to_z0(
                    x[sl], y[sl], t[sl], trj, SE3(rv_q, rv_t), None, K_cam,
                    Kv_inv, z0=z0, width=mapper.width, packet_size=PACKET,
                    full=True, rect_params=rect_params)
                dsis.append(splat(packets, depths, z0, vp, mapper.width,
                                  mapper.height, plane_block=plane_block))
            fused_k = gridops.fuse_pair(dsis[0], dsis[1], gridops.FUSE_HM)
            acc = gridops.add_inverse(
                acc if acc is not None else jnp.zeros_like(fused_k), fused_k)
        fused = gridops.hm_from_sum_of_inv(acc, n_sub)
        res = extract.get_depth_map_from_dsi(fused, mapper.depth_vec, opts)
        return res.depth

    return step


def make_step(mapper, traj, T_rv_w, backend, plane_block):
    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.ops import trajectory as trajmod, voting
    from dvs_mcemvs_tpu.ops.se3 import SE3

    from dvs_mcemvs_tpu.ops import camera as camops

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    traj_ts, traj_q, traj_t = traj.ts, traj.poses.q, traj.poses.t
    rv_q, rv_t = T_rv_w.q, T_rv_w.t
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)

    @jax.jit
    def step(x, y, t):
        trj = trajmod.Trajectory(traj_ts, SE3(traj_q, traj_t))
        packets = voting.warp_events_to_z0(
            x, y, t, trj, SE3(rv_q, rv_t), None, K_cam, Kv_inv,
            z0=z0, width=mapper.width, packet_size=PACKET, full=True,
            rect_params=rect_params,
        )
        return splat(packets, depths, z0, vp, mapper.width, mapper.height,
                     plane_block=plane_block)

    return step


_RTT = None


def _tunnel_rtt():
    """Dispatch + scalar-readback round trip (tunneled TPUs: ~20 ms).

    block_until_ready can return before the device finishes on tunneled
    backends, so honest timing loops N dispatches, reads one scalar of the
    final output back (forcing completion), and subtracts this RTT once.
    """
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        tiny = jax.jit(lambda v: v + 1.0)
        z = jnp.zeros((8, 128))
        float(tiny(z)[0, 0])
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(tiny(z)[0, 0])
            samples.append(time.perf_counter() - t0)
        _RTT = float(np.median(samples))
    return _RTT


def _force(out):
    """Read one scalar back, forcing device completion (any output rank)."""
    return float(out[(0,) * out.ndim])


def time_step(step, dev_args, iters=None, min_time=1.2):
    """Duration-targeted min-of-3 timing: each timed region runs enough
    iterations to span >= `min_time` seconds, so the tunnel's 25-140 ms
    dispatch RTT (subtracted once per region) is noise, not signal.  The
    pre-r5 fixed iteration counts made short regions RTT-dominated — the
    source of the phantom "seg32 beats seg16" alternatives readings
    (docs/performance.md)."""
    import math

    out = step(*dev_args)
    _force(out)  # warmup / compile / settle
    if iters is None:
        t0 = time.perf_counter()
        _force(step(*dev_args))
        dt0 = max(time.perf_counter() - t0 - _tunnel_rtt(), 1e-5)
        iters = int(np.clip(math.ceil(min_time / dt0), 10, 3000))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*dev_args)
        _force(out)  # force completion of the whole chain
        runs.append((time.perf_counter() - t0 - _tunnel_rtt()) / iters)
    return max(min(runs), 1e-9)


def full_seq_sustained(backend, plane_block, n_chunks=22, warmup=2,
                       duration=0.2):
    """Sustained scheduler throughput (VERDICT r4 item 3): >= 20 chunks of
    the headline workload through the full_seq chunk loop with an
    HBM-RESIDENT event store — the stream is ingested ONCE (native .evs
    store -> device arrays), each chunk is a device-side dynamic slice,
    and per chunk the full process_1 computation (warp -> vote x2 -> HM
    fuse -> collapse -> extract) runs on-device, with a QUANTIZED single
    device->host transfer feeding the worker-pool save pipeline (the full
    saveDepthMaps artifact set per chunk).  Reports sustained Mev/s
    including the per-chunk downlink and output writes — the span of the
    reference's per-chunk loop (main.cpp:173-302) around its Mev/s probe
    (process1.cpp:82-86).

    Keeping events resident in HBM (16 GB: hours of stream) instead of
    re-uploading per chunk is the TPU-native full_seq design; over this
    session's tunneled chip the host link runs at ~60-90 MB/s up /
    ~20-40 MB/s down (measured, reported in the result), which would cap a
    host-streamed loop at single-digit Mev/s regardless of kernel speed.

    The stream time-tiles the 1 Mi-event bench stream: chunk k spans
    [k*duration, (k+1)*duration) with the camera advancing the same 0.5 m
    per chunk as the headline workload (continuous across chunks), so the
    auto backend spec and all jit shapes match the headline's exactly.
    """
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from dvs_mcemvs_tpu.io import outputs
    from dvs_mcemvs_tpu.mapper import Events
    from dvs_mcemvs_tpu.ops import (camera as camops, extract,
                                    grid as gridops,
                                    trajectory as trajmod, voting)
    from dvs_mcemvs_tpu.ops.se3 import SE3
    from dvs_mcemvs_tpu.utils.writers import SaveWorkerPool

    mapper, (x, y, t), traj, T_rv_w = build_workload()
    tmin, tmax = float(t[0]), float(t[-1])
    span = max(tmax - tmin, 1e-9)
    # Chunk k's events: the bench stream remapped into (k*D, (k+1)*D).
    tg = [((t - tmin) / span * 0.96 + 0.02 + k) * duration
          for k in range(n_chunks)]
    x_all = np.tile(x, n_chunks).astype(np.int32)
    y_all = np.tile(y, n_chunks).astype(np.int32)
    t_all = np.concatenate(tg).astype(np.float32)
    p_all = np.ones_like(x_all, np.int8)

    # Continuous trajectory: 0.5 m of travel per `duration` (the headline
    # chunk's travel), camera1 at +0.6 m stereo baseline.
    tsp = np.linspace(0.0, n_chunks * duration, n_chunks * 50)
    qp = np.tile([1.0, 0.0, 0.0, 0.0], (tsp.size, 1))
    pp = np.stack([0.5 * tsp / duration, 0.0 * tsp, 0.0 * tsp], axis=-1)
    traj0 = trajmod.from_arrays(tsp, qp, pp)

    # INGEST (once): write + read back through the native mmap store, then
    # park the stream in HBM.
    work = tempfile.mkdtemp(prefix="bench_fullseq_")
    ev = Events(x_all, y_all, t_all, p_all)
    store_used = False
    try:
        from dvs_mcemvs_tpu.io import evstore

        path = f"{work}/events.evs"
        evstore.write_store(path, ev)
        st = evstore.EventStore(path)
        ev = st.window(-1.0, (n_chunks + 1) * duration)
        st.close()
        store_used = True
    except Exception as e:  # no native toolchain: numpy stream as-is
        print(f"full_seq bench: native store unavailable ({e!r})",
              file=sys.stderr)
    x_dev = jnp.asarray(ev.x, jnp.int32)
    y_dev = jnp.asarray(ev.y, jnp.int32)
    t_dev = jnp.asarray(ev.t, jnp.float32)

    # Per-chunk slice offsets from the store's time index (host binary
    # search; slices are equal-size by construction so jit shapes stay
    # fixed — the bucket-pad policy of the host scheduler).
    t_np = np.asarray(ev.t)
    offs = [int(np.searchsorted(t_np, k * duration)) for k in range(n_chunks)]
    assert all(o2 - o1 == N_EVENTS for o1, o2 in zip(offs, offs[1:])), offs

    z0 = float(mapper.depth_vec.depths()[0])
    vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
          float(mapper.vcam.cx), float(mapper.vcam.cy))
    K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
    Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
    depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
    rect_params = camops.rect_static(mapper.cam)
    splat = voting.resolve_backend(backend)
    opts = extract.DepthMapOptions()
    traj_t1 = traj0.poses.t + jnp.asarray([0.6, 0.0, 0.0],
                                          traj0.poses.t.dtype)
    min_d, max_d = 2.0, 40.0
    H, W = mapper.height, mapper.width

    @jax.jit
    def step(off, ts_k, x_dev, y_dev, t_dev):
        # The resident stream rides in as ARGUMENTS: closing over the
        # device arrays would embed them as HLO constants (an ~84 MB
        # compile payload — the axon remote-compile service rejects it).
        xs = jax.lax.dynamic_slice(x_dev, (off,), (N_EVENTS,))
        ys = jax.lax.dynamic_slice(y_dev, (off,), (N_EVENTS,))
        tsx = jax.lax.dynamic_slice(t_dev, (off,), (N_EVENTS,))
        T_w_rv, _ = trajmod.pose_at(traj0, ts_k)
        from dvs_mcemvs_tpu.ops import se3 as se3mod

        T_rv = se3mod.inverse(T_w_rv)
        dsis = []
        for tt in (traj0.poses.t, traj_t1):
            trj = trajmod.Trajectory(traj0.ts, SE3(traj0.poses.q, tt))
            packets = voting.warp_events_to_z0(
                xs, ys, tsx, trj, T_rv, None, K_cam, Kv_inv,
                z0=z0, width=W, packet_size=PACKET, full=True,
                rect_params=rect_params)
            dsis.append(splat(packets, depths, z0, vp, W, H,
                              plane_block=plane_block))
        fused = gridops.fuse_many(dsis, gridops.FUSE_HM)
        res = extract.get_depth_map_from_dsi(fused, mapper.depth_vec, opts)
        # Quantized single-buffer downlink: u16 depth over [min_d, max_d]
        # (0.6 mm step), u8 min-max confidence (its only artifact is the
        # 8-bit negated PNG, so 256 levels are lossless) + its f32 range,
        # u8 mask.
        dq = jnp.clip((res.depth - min_d) / (max_d - min_d), 0, 1) * 65535
        dq = dq.astype(jnp.uint16)
        cmin, cmax = jnp.min(res.confidence), jnp.max(res.confidence)
        cq = ((res.confidence - cmin) / jnp.maximum(cmax - cmin, 1e-9)
              * 255).astype(jnp.uint8)
        planes = jnp.stack([(dq >> 8).astype(jnp.uint8),
                            (dq & 0xFF).astype(jnp.uint8),
                            cq,
                            res.mask.astype(jnp.uint8)])
        scales = jnp.stack([cmin, cmax]).astype(jnp.float32)
        scales_u8 = jax.lax.bitcast_convert_type(scales, jnp.uint8)
        return jnp.concatenate([planes.reshape(-1),
                                scales_u8.reshape(-1)])

    def save_chunk(k, ts_k, packed):
        arr = np.asarray(packed)  # the one device->host transfer
        scales = arr[-8:].view(np.float32)
        pl4 = arr[:-8].reshape(4, H, W)
        depth = (pl4[0].astype(np.uint16) << 8 | pl4[1]).astype(np.float32)
        depth = depth / 65535.0 * (max_d - min_d) + min_d
        conf = pl4[2].astype(np.float32)
        conf = conf / 255.0 * (scales[1] - scales[0]) + scales[0]
        mask = pl4[3]
        depth = np.where(mask > 0, depth, 0.0)
        prefix = outputs.timestamp_prefix(work, ts_k)
        outputs.save_depth_maps(depth, conf, mask, min_d, max_d, "fused",
                                prefix)

    # Context for the committed number: the per-chunk downlink (the 1.5 MB
    # quantized buffer) rides the host link, whose measured rate bounds
    # the sustained figure on a tunneled chip regardless of kernel speed.
    probe = step(jnp.int32(offs[0]), jnp.float32(0.5 * duration),
                 x_dev, y_dev, t_dev)
    np.asarray(probe)  # settle
    t0 = time.perf_counter()
    buf = np.asarray(step(jnp.int32(offs[0]), jnp.float32(0.5 * duration),
                          x_dev, y_dev, t_dev))
    downlink_mb_s = buf.nbytes / 2**20 / max(time.perf_counter() - t0, 1e-9)

    pool = SaveWorkerPool()
    n_done = 0
    t_start = None
    for k in range(n_chunks):
        ts_k = (k + 0.5) * duration
        if k == warmup:
            pool.drain()          # warmup chunks fully written
            t_start = time.perf_counter()
        out = step(jnp.int32(offs[k]), jnp.float32(ts_k),
                   x_dev, y_dev, t_dev)
        pool.submit(save_chunk, k, ts_k, out)
        n_done += 1
    pool.drain()
    wall = time.perf_counter() - (t_start or time.perf_counter())
    pool.shutdown()
    n_files = len([f for f in os.listdir(work) if f.endswith(".png")])
    shutil.rmtree(work, ignore_errors=True)
    timed = n_done - warmup
    if timed <= 0 or wall <= 0:
        raise RuntimeError(f"too few chunks timed ({n_done})")
    mev_s = 2 * N_EVENTS * timed / wall / 1e6
    return {"mev_s": round(mev_s, 2), "chunks_timed": timed,
            "events_per_chunk": 2 * N_EVENTS,
            "seconds_per_chunk": round(wall / timed, 4),
            "store_ingest": store_used, "hbm_resident_events": True,
            "artifact_files": n_files,
            "downlink_mb_per_chunk": round(buf.nbytes / 2**20, 2),
            "downlink_mb_s": round(downlink_mb_s, 1),
            "includes": "one-time store ingest -> HBM-resident stream, "
                        "device-side chunk windowing, voting, fusion, "
                        "extraction, quantized downlink, saveDepthMaps "
                        "artifact writes (worker pool)",
            "note": "on a tunneled chip the per-chunk downlink rate is "
                    "the sustained ceiling (compute is ~19 ms/chunk); "
                    "local-attached HBM->host links are 2-3 orders "
                    "faster"}


def golden_gate(spec=None):
    """Run a voting spec on the BENCH16 golden fixture ON THE DEVICE and
    score it against its committed exact-scatter anchor (BUDGET_BENCH16
    + the BASELINE 5 % metric stand-in) — so the committed perf number is
    taken at certified accuracy (VERDICT r3 item 2).  BENCH16 is the
    zurich_city_04 window whose 0.393 m of real travel auto-selects the
    SAME g16 group size as the headline workload, so main() can pass the
    LITERAL headline spec string and gate exactly the backend the
    throughput number times (VERDICT r4 item 4); `spec=None` uses the
    fixture's own auto spec (identical string by construction — asserted
    by tests/test_golden_fast.py)."""
    import jax

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import get_depth_map
    from dvs_mcemvs_tpu.ops import extract
    from dvs_mcemvs_tpu.utils import golden

    mappers, events, trajs, scene, ts_rv = golden.build_golden_fixture(
        cfg=golden.BENCH16)
    if spec is None:
        spec = golden.production_backend_spec(
            events, 1024, use_pallas=jax.default_backend() != "cpu",
            cfg=golden.BENCH16)
    vopts = pipeline.VotingOptions(packet_size=1024, backend=spec,
                                   pad_policy="bucket")
    res = pipeline.process_1(mappers, events, trajs, ts_rv,
                             stereo_fusion=2, vopts=vopts)
    dm = get_depth_map(mappers[0], res.fused_dsi, extract.DepthMapOptions())

    g = np.load(golden.GOLDEN_BENCH16_NPZ)
    gi = np.asarray(g["depth_indices"]).astype(int)
    conf = np.asarray(g["confidence"])
    budget = golden.BUDGET_BENCH16
    sel = conf > np.quantile(conf, budget["confident_quantile"])
    ei = np.abs(np.asarray(dm.depth_indices).astype(int)[sel] - gi[sel])
    m = np.asarray(dm.mask) > 0
    rel = float(np.median(np.abs(np.asarray(dm.depth)[m] - scene.gt_depth[m])
                          / scene.gt_depth[m]))
    within1, within2 = float(np.mean(ei <= 1)), float(np.mean(ei <= 2))
    med = float(np.median(ei))
    ok = (within1 >= budget["frac_within_1_plane"]
          and within2 >= budget["frac_within_2_planes"]
          and med <= budget["median_err_planes"]
          and rel < budget["gt_median_rel_err"])
    return {"spec": spec, "within1": round(within1, 4),
            "within2": round(within2, 4), "median_planes": med,
            "gt_median_rel_err": round(rel, 4), "pass": bool(ok)}


def main():
    import jax
    import jax.numpy as jnp

    mapper, (x, y, t), traj, T_rv_w = build_workload()
    dev_args = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
                jnp.asarray(t, jnp.float32))

    # The HEADLINE number is the spec the product actually ships: the same
    # auto_backend_spec call the CLI makes (cli.py --splat_backend=auto) and
    # the golden accuracy gates certify — not a tournament winner the user
    # never runs.  The group size is bounded by the workload's camera travel
    # (voting_hist.auto_group_size) so throughput is taken at honest
    # accuracy.
    from dvs_mcemvs_tpu.ops.voting_hist import (auto_backend_spec,
                                                auto_group_size)
    use_pl = jax.default_backend() != "cpu"
    backend = auto_backend_spec(0.5, N_EVENTS // PACKET, WIDTH * 0.9,
                                2.0, 40.0, DIM_Z, use_pl)
    plane_block = 7

    def timed(maker, spec, pb):
        step = maker(mapper, traj, T_rv_w, spec, pb)
        return time_step(step, dev_args), step

    dt, step = timed(make_step, backend, plane_block)
    mev_s = N_EVENTS / dt / 1e6

    # Guardrail: if the shipped auto spec falls >10 % behind the best known
    # alternative, flag it loudly (VERDICT r2 weak #2) — the fix belongs in
    # auto_backend_spec, not in benching a path users don't run.
    g = auto_group_size(0.5, N_EVENTS // PACKET, WIDTH * 0.9, 2.0, 40.0)
    alternatives = {}
    for alt, pb in [(f"hist:g{g},seg16,bf,pl", 7),
                    (f"hist:g{g},seg32,bf,pl", 4)]:
        if alt == backend:
            continue
        try:
            adt, _ = timed(make_step, alt, pb)
            alternatives[alt] = round(N_EVENTS / adt / 1e6, 2)
        except Exception as e:
            # A broken candidate must be visible, never silently dropped.
            import traceback
            print(f"bench alternative {alt!r} failed: {e!r}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
    best_alt = max(alternatives.values(), default=0.0)
    if best_alt > 1.1 * mev_s:
        print(f"WARNING: auto spec {backend!r} ({mev_s:.1f} Mev/s) is >10% "
              f"behind best alternative ({best_alt:.1f} Mev/s) — retune "
              "auto_backend_spec", file=sys.stderr)

    # Second metric (VERDICT r2 item 5): the full process_1 chunk —
    # warp -> vote (2 cams) -> HM fuse -> collapse -> extract — on the same
    # shipped spec; this is the span the reference's log times.
    cdt, cstep = timed(make_full_chunk_step, backend, plane_block)
    chunk_mev_s = 2 * N_EVENTS / cdt / 1e6

    # Temporal flagship (VERDICT r4 item 7): the process_2 chunk on the
    # same spec — 2 sub-intervals, per-sub camera HM fuse, streaming
    # temporal HM, extraction.
    try:
        adt, _ = timed(make_alg2_step, backend, plane_block)
        alg2_mev_s = round(2 * N_EVENTS / adt / 1e6, 2)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        alg2_mev_s = {"error": repr(e)}

    # Sustained scheduler throughput (VERDICT r4 item 3): >= 20 chunks
    # through stores + prefetch + worker-pool saves.
    try:
        sustained = full_seq_sustained(backend, plane_block)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        sustained = {"error": repr(e)}

    # Accuracy certification at the committed perf number (on-device), on
    # the LITERAL headline spec string (VERDICT r4 item 4).
    try:
        golden = golden_gate(spec=backend)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        golden = {"error": repr(e), "pass": False}
    if not golden.get("pass"):
        print(f"WARNING: golden accuracy gate FAILED on device: {golden}",
              file=sys.stderr)

    # Roofline/MFU accounting (VERDICT r4 item 1): per-stage achieved
    # TFLOP/s / GB/s vs this chip's measured peaks (scripts/roofline.py).
    try:
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent / "scripts"))
        import roofline

        rl = roofline.run(spec=backend, min_time=0.8)
        mfu = {
            "peaks": rl["peaks"],
            "stages": {k: {f: v[f] for f in
                           ("ms", "pct_peak_mxu", "pct_peak_hbm", "bound",
                            "bound_ms", "headroom_x") if f in v}
                       for k, v in rl["stages"].items()},
            "vote_bound_mev_s": rl["summary"]["vote_bound_mev_s"],
            "headroom_x": rl["summary"]["headroom_x"],
        }
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        mfu = {"error": repr(e)}

    print(json.dumps({
        "metric": "dsi_voting_throughput",
        "value": round(mev_s, 2),
        "unit": "Mev/s",
        "vs_baseline": round(mev_s / BASELINE_MEV_S, 3),
        "detail": {
            "backend": backend,
            "backend_is_cli_auto_spec": True,
            "plane_block": plane_block,
            "dsi": [DIM_Z, HEIGHT, WIDTH],
            "events": N_EVENTS,
            "seconds_per_step": round(dt, 4),
            "full_chunk_mev_s": round(chunk_mev_s, 2),
            "full_chunk_vs_baseline": round(chunk_mev_s / BASELINE_MEV_S, 3),
            "full_chunk_events": 2 * N_EVENTS,
            "full_chunk_seconds": round(cdt, 4),
            "alternatives_mev_s": alternatives,
            "alg2_chunk_mev_s": alg2_mev_s,
            "full_seq_sustained_mev_s": (
                sustained.get("mev_s", sustained) if isinstance(sustained, dict)
                else sustained),
            "full_seq_sustained": sustained,
            "golden": golden,
            "mfu": mfu,
            "device": str(jax.devices()[0].platform),
        },
    }))


if __name__ == "__main__":
    main()
