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

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = eval_main([
            "--run_dir", run_dir, "--suffix", "fused",
            "--gt_timestamps", ts_file, "--gt_depth_npy_dir", gt_dir,
            "--fx", str(golden.FX), "--cx", str(golden.WIDTH / 2 - 0.5),
            "--cy", str(golden.HEIGHT / 2 - 0.5),
            "--width", str(golden.WIDTH), "--height", str(golden.HEIGHT),
            "--baseline", str(golden.BASELINE),
        ])
    assert rc == 0, buf.getvalue()
    report = json.loads(buf.getvalue())
    plane_m = (golden.MAX_DEPTH - golden.MIN_DEPTH) / golden.DIM_Z
    report["plane_spacing_m"] = plane_m
    report["target"] = ("median depth error within 5% relative "
                        "(BASELINE.md DSEC target stand-in)")
    report["median_rel_err"] = report["median_err"] / float(
        np.median(scene.gt_depth))
    report["pass"] = bool(report["median_rel_err"] < 0.05)
    with open(os.path.join(REPO, "GOLDEN_METRICS.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"total {time.time()-t0:.1f}s", file=sys.stderr)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
