#!/usr/bin/env python
"""Generate the committed golden accuracy artifacts (run once, re-runnable).

Builds the DSEC-scale golden fixture (utils/golden.py: 640x480x100 DSI, real
zurich_city_04 pose window, analytic stripe-plane ground truth), votes it
with the EXACT per-event `scatter` backend (the reference-faithful per-event
bilinear splat, no histogram approximation), extracts the depth map, and
writes:

  tests/golden/golden_dsec.npz   — depth indices, mask, confidence,
                                   vote-mass, GT depth, metadata
  GOLDEN_METRICS.json            — the evaluate_dsec protocol run on the
                                   golden output vs analytic GT (the
                                   committed stand-in for the 5 % DSEC
                                   accuracy target, BASELINE.md)

Reference protocol: mapper_emvs_stereo/scripts/evaluate_mcemvs_dsec.py:43-141.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_aux(cfg, npz_path, label):
    """Generate an auxiliary exact-scatter anchor for a GoldenConfig
    profile: index/mass artifacts only — the FULL fixture keeps the metric
    protocol.  Used for golden.SMALL (fast CI tier,
    tests/test_golden_fast.py) and golden.BENCH16 (the g16-travel window
    the on-device bench gate scores the literal headline spec against)."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import get_depth_map
    from dvs_mcemvs_tpu.ops import extract
    from dvs_mcemvs_tpu.utils import golden

    t0 = time.time()
    mappers, events, trajs, scene, ts_rv = golden.build_golden_fixture(cfg=cfg)
    print(f"{label} fixture: {[e.num for e in events]} events, "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    vopts = pipeline.VotingOptions(packet_size=1024, backend="scatter",
                                   pad_policy="bucket", sync=True)
    res = pipeline.process_1(mappers, events, trajs, ts_rv,
                             stereo_fusion=2, vopts=vopts)
    dm = get_depth_map(mappers[0], res.fused_dsi, extract.DepthMapOptions())

    m = np.asarray(dm.mask) > 0
    rel = float(np.median(np.abs(np.asarray(dm.depth)[m] - scene.gt_depth[m])
                          / scene.gt_depth[m]))
    assert rel < golden.BUDGET["gt_median_rel_err"], \
        f"{label} anchor itself off GT: median rel {rel}"

    meta = dict(
        seed=golden.SEED, dim=[cfg.dim_z, cfg.height, cfg.width],
        min_depth=golden.MIN_DEPTH, max_depth=golden.MAX_DEPTH,
        events=[int(e.num) for e in events], backend="scatter",
        packet_size=1024, stereo_fusion=2, ts_rv=ts_rv,
        gt_median_rel_err=rel,
        pose_source="data/DSEC/zurich_city_04_pose.npz",
        window_offset_s=cfg.window_offset_s,
        window_len_s=golden.WINDOW_LEN_S)
    os.makedirs(os.path.dirname(npz_path), exist_ok=True)
    np.savez_compressed(
        npz_path,
        depth_indices=np.asarray(dm.depth_indices, np.int16),
        mask=np.asarray(dm.mask, np.uint8),
        confidence=np.asarray(dm.confidence, np.float32),
        depth=np.asarray(dm.depth, np.float32),
        cam_mass=np.asarray(
            [np.asarray(res.dsis[f"camera{c}"], np.float64).sum()
             for c in range(2)]),
        gt_depth=scene.gt_depth.astype(np.float32),
        meta=json.dumps(meta))
    print(f"{label} golden npz written "
          f"({os.path.getsize(npz_path)//1024} KiB), "
          f"gt median rel {rel:.4f}, {time.time()-t0:.1f}s", file=sys.stderr)
    return 0


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.io import outputs
    from dvs_mcemvs_tpu.mapper import get_depth_map
    from dvs_mcemvs_tpu.ops import extract
    from dvs_mcemvs_tpu.utils import golden

    t0 = time.time()
    mappers, events, trajs, scene, ts_rv = golden.build_golden_fixture()
    print(f"fixture: {[e.num for e in events]} events, "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

    vopts = pipeline.VotingOptions(packet_size=1024, backend="scatter",
                                   pad_policy="bucket", sync=True)
    res = pipeline.process_1(mappers, events, trajs, ts_rv,
                             stereo_fusion=2, vopts=vopts)
    dsi = np.asarray(res.fused_dsi, np.float64)
    print(f"scatter voting done, {time.time()-t0:.1f}s", file=sys.stderr)

    opts = extract.DepthMapOptions(
        adaptive_threshold_kernel_size=5, adaptive_threshold_c=5.0,
        median_filter_size=5)
    dm = get_depth_map(mappers[0], res.fused_dsi, opts)

    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    meta = dict(
        seed=golden.SEED, dim=[golden.DIM_Z, golden.HEIGHT, golden.WIDTH],
        min_depth=golden.MIN_DEPTH, max_depth=golden.MAX_DEPTH,
        events=[int(e.num) for e in events], backend="scatter",
        packet_size=1024, stereo_fusion=2, ts_rv=ts_rv,
        pose_source="data/DSEC/zurich_city_04_pose.npz",
        window_offset_s=golden.WINDOW_OFFSET_S,
        window_len_s=golden.WINDOW_LEN_S)
    np.savez_compressed(
        golden.GOLDEN_NPZ,
        depth_indices=np.asarray(dm.depth_indices, np.int16),
        mask=np.asarray(dm.mask, np.uint8),
        confidence=np.asarray(dm.confidence, np.float32),
        depth=np.asarray(dm.depth, np.float32),
        vote_mass=np.float64(dsi.sum()),
        cam_mass=np.asarray(
            [np.asarray(res.dsis[f"camera{c}"], np.float64).sum()
             for c in range(2)]),
        dsi_meansq=np.float64((dsi ** 2).mean()),
        gt_depth=scene.gt_depth.astype(np.float32),
        meta=json.dumps(meta))
    print(f"golden npz written ({os.path.getsize(golden.GOLDEN_NPZ)//1024} "
          f"KiB), {time.time()-t0:.1f}s", file=sys.stderr)

    # evaluate_dsec protocol: write the run artifacts + GT frames, then run
    # the committed driver on them.
    import tempfile

    run_dir = tempfile.mkdtemp(prefix="golden_run_")
    gt_dir = tempfile.mkdtemp(prefix="golden_gt_")
    prefix = outputs.timestamp_prefix(run_dir, ts_rv)
    outputs.save_depth_maps(
        np.asarray(dm.depth), np.asarray(dm.confidence), np.asarray(dm.mask),
        golden.MIN_DEPTH, golden.MAX_DEPTH, "fused", prefix)
    np.save(os.path.join(gt_dir, "000000.npy"), scene.gt_depth)
    ts_file = os.path.join(gt_dir, "timestamps.txt")
    with open(ts_file, "w") as f:
        f.write(f"{ts_rv * 1e6}\n")

    from evaluate_dsec import main as eval_main  # scripts/ is on sys.path
    import io
    import contextlib

    def run_eval(rdir, tsf, gdir):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = eval_main([
                "--run_dir", rdir, "--suffix", "fused",
                "--gt_timestamps", tsf, "--gt_depth_npy_dir", gdir,
                "--fx", str(golden.FX), "--cx", str(golden.WIDTH / 2 - 0.5),
                "--cy", str(golden.HEIGHT / 2 - 0.5),
                "--width", str(golden.WIDTH), "--height", str(golden.HEIGHT),
                "--baseline", str(golden.BASELINE),
            ])
        assert rc == 0, buf.getvalue()
        return json.loads(buf.getvalue())

    report = run_eval(run_dir, ts_file, gt_dir)
    plane_m = (golden.MAX_DEPTH - golden.MIN_DEPTH) / golden.DIM_Z
    report["plane_spacing_m"] = plane_m
    report["target"] = ("median depth error within 5% relative "
                        "(BASELINE.md DSEC target stand-in)")
    report["median_rel_err"] = report["median_err"] / float(
        np.median(scene.gt_depth))
    report["pass"] = bool(report["median_rel_err"] < 0.05)

    # --- Multi-frame anchor (VERDICT r3 item 6): full_seq over the golden
    # window, 5 chunks, exact scatter voting, evaluated per-chunk against
    # the per-pose analytic GT (golden.gt_depth_at_pose) with the same
    # evaluate_dsec protocol — consolidated over ALL frames, so the pass
    # gate cannot be saturated by one frame's median
    # (evaluate_mcemvs_dsec.py:129-145 consolidates frames the same way).
    from dvs_mcemvs_tpu.ops import trajectory as trajmod

    mf_run = tempfile.mkdtemp(prefix="golden_mf_run_")
    mf_gt = tempfile.mkdtemp(prefix="golden_mf_gt_")
    # duration=0.2 is the reference's own DSEC chunk length
    # (cfg/DSEC/interlaken_00_b_2/dsec.conf); shorter chunks starve the
    # per-camera DSIs of monocular baseline on this fixture.
    fopts = pipeline.FullSeqOptions(start_time=0.0, stop_time=0.4,
                                    duration=0.2, out_skip=0.04)
    gt_times = []
    for k, ts_k, res_k in pipeline.run_full_seq(
            mappers, events, trajs, fopts,
            lambda mps, evs, trs, t: pipeline.process_1(
                mps, evs, trs, t, stereo_fusion=2, vopts=vopts)):
        dm_k = get_depth_map(mappers[0], res_k.fused_dsi, opts)
        prefix_k = outputs.timestamp_prefix(mf_run, ts_k)
        outputs.save_depth_maps(
            np.asarray(dm_k.depth), np.asarray(dm_k.confidence),
            np.asarray(dm_k.mask), golden.MIN_DEPTH, golden.MAX_DEPTH,
            "fused", prefix_k)
        T_w_c, ok = trajmod.pose_at(trajs[0], np.float32(ts_k))
        T_w_c1, ok1 = trajmod.pose_at(trajs[1], np.float32(ts_k))
        assert bool(np.asarray(ok)) and bool(np.asarray(ok1))
        np.save(os.path.join(mf_gt, f"{len(gt_times):06d}.npy"),
                golden.gt_depth_at_pose(scene, T_w_c, T_w_c_right=T_w_c1))
        gt_times.append(ts_k)
        print(f"multi-frame chunk {k} @ ts={ts_k:.3f} done, "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
    mf_ts_file = os.path.join(mf_gt, "timestamps.txt")
    with open(mf_ts_file, "w") as f:
        for tk in gt_times:
            f.write(f"{tk * 1e6}\n")

    mf = run_eval(mf_run, mf_ts_file, mf_gt)
    mf["median_rel_err"] = mf["median_err"] / float(
        np.median(scene.gt_depth))
    # Gates: consolidated median (the BASELINE 5 % stand-in) PLUS mean and
    # bad-p, so a drift that leaves the median alone still fails (VERDICT
    # r3 weak #7).  Anchor measured (exact scatter, 6 frames, 2026-08):
    # mean 1.40 m, bad_p 0.220, median_rel 0.014 — gates tightened r5
    # (VERDICT r4 weak #6: 1.8/0.30 left a quarter-worse regression
    # passable) to measured + ~15 % margin; a real regression — lost
    # votes, broken fusion, mask drift — moves all three at once.
    mf["gates"] = {"median_rel_err": 0.05, "mean_err": 1.6, "bad_p": 0.25,
                   "min_frames": 5}
    mf["pass"] = bool(
        mf["median_rel_err"] < mf["gates"]["median_rel_err"]
        and mf["mean_err"] < mf["gates"]["mean_err"]
        and mf["bad_p"] < mf["gates"]["bad_p"]
        and mf["frames_evaluated"] >= mf["gates"]["min_frames"])

    out_report = {"single_frame": report, "multi_frame": mf,
                  "pass": bool(report["pass"] and mf["pass"])}
    with open(os.path.join(REPO, "GOLDEN_METRICS.json"), "w") as f:
        json.dump(out_report, f, indent=1)
    print(json.dumps(out_report))
    print(f"total {time.time()-t0:.1f}s", file=sys.stderr)
    return 0 if out_report["pass"] else 1


def _dispatch(argv):
    from dvs_mcemvs_tpu.utils import golden

    if "--small" in argv:
        return make_aux(golden.SMALL, golden.GOLDEN_SMALL_NPZ, "small")
    if "--bench-window" in argv:
        return make_aux(golden.BENCH16, golden.GOLDEN_BENCH16_NPZ, "bench16")
    return main()


if __name__ == "__main__":
    sys.exit(_dispatch(sys.argv[1:]))
