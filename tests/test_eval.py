"""Evaluation suite: metric golden values and the DSEC reprojection protocol."""

import os

import numpy as np
import pytest

from dvs_mcemvs_tpu.eval import dsec, metrics


def test_error_metrics_perfect():
    gt = np.full((10, 10), 2.0)
    m = metrics.error_metrics(gt, gt, b=0.6, f=500.0)
    assert m.delta1 == 1.0 and m.delta3 == 1.0
    assert m.silog == pytest.approx(0.0, abs=1e-12)
    assert m.abs_rel == 0.0 and m.log_rmse == 0.0 and m.bad_p == 0.0
    assert m.mean_err == 0.0 and m.count == 100


def test_error_metrics_golden():
    # Hand-computable: gt 2.0, est 2.5 everywhere.
    gt = np.full(50, 2.0)
    est = np.full(50, 2.5)
    m = metrics.error_metrics(est, gt, b=0.6, f=500.0)
    # ratio is exactly 1.25: excluded by the strict < (depth_metrics.py:9-12)
    assert m.delta1 == 0.0
    assert m.delta2 == 1.0 and m.delta3 == 1.0
    assert m.abs_rel == pytest.approx(0.5 / 2.5)
    assert m.log_rmse == pytest.approx(abs(np.log(2.0) - np.log(2.5)))
    assert m.silog == pytest.approx(0.0, abs=1e-12)  # constant log diff
    # bad-p: err_px = |1/2.5 - 1/2| * 0.6 * 500 = 30 > 5; rel = 0.1*2/... > 5%
    assert m.bad_p == 1.0
    assert m.mean_err == pytest.approx(0.5)
    assert m.median_err == pytest.approx(0.5)


def test_error_metrics_masked():
    gt = np.ma.array([2.0, 2.0, 99.0], mask=[False, False, True])
    est = np.ma.array([2.0, 4.0, 1.0], mask=[False, False, False])
    m = metrics.error_metrics(est, gt, b=0.6, f=500.0)
    assert m.count == 2
    assert m.delta1 == 0.5   # ratios 1.0 and 2.0


def test_precision_completeness_curves():
    gt = np.ma.array(np.full(100, 2.0))
    est = np.ma.array(np.concatenate([np.full(50, 2.005), np.full(25, 2.055),
                                      np.full(25, 3.0)]))
    out = metrics.precision_completeness(est, gt, bin_width=0.01)
    # by 0.02 m: 50 of 100 points in; by 0.06: 75
    e = out["edges"]
    assert out["precision"][np.searchsorted(e, 0.02)] == pytest.approx(50.0)
    assert out["precision"][np.searchsorted(e, 0.06)] == pytest.approx(75.0)
    assert out["recall"][-1] == pytest.approx(100.0)
    assert out["outliers"][0] <= 100.0
    f1 = out["f1"]
    assert np.all(f1 <= 100.0 + 1e-9)


def test_disparity_reprojection_identity_rig():
    """A synthetic rig whose Q matrix and target camera are mutually
    consistent must reproduce depth = f*b/disparity at the same pixels."""
    f, b = 500.0, 0.6
    W, H = 64, 48
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    # Standard Q for a rectified pair with principal point (cx, cy):
    Q = np.array([
        [1, 0, 0, -W / 2],
        [0, 1, 0, -H / 2],
        [0, 0, 0, f],
        [0, 0, 1 / b, 0],
    ])
    rig = dsec.DsecEvalRig(Q=Q, T_rect0_0=np.eye(4), K_target=K, baseline=b)

    disp = np.zeros((H, W), np.float32)
    disp[10, 20] = 10.0   # depth = f*b/10 = 30 m
    disp[30, 40] = 60.0   # depth = 5 m
    out = dsec.disparity_to_depth_map(disp, rig)
    # Projection truncates to int like the reference (float round-trip can
    # land one pixel off); check the values in a 1-px neighborhood.
    vals = out.compressed()
    assert sorted(np.round(vals, 4)) == [
        pytest.approx(f * b / 60.0, rel=1e-6),
        pytest.approx(f * b / 10.0, rel=1e-6),
    ]
    ys, xs = np.nonzero(~out.mask)
    assert any(abs(y - 10) <= 1 and abs(x - 20) <= 1 for y, x in zip(ys, xs))
    assert any(abs(y - 30) <= 1 and abs(x - 40) <= 1 for y, x in zip(ys, xs))
    assert out.mask[0, 0]


def test_match_timestamps():
    gt_us = np.array([1.0e6, 2.0e6, 3.0e6])
    pairs = dsec.match_timestamps([0.45, 0.99, 2.5], gt_us, event_start_time=1.0)
    # 0.45 -> nearest gt 1.0e6+? abs times: 1.45 vs [1,2,3] -> gt 1.0, dt 0.45: no
    # 0.99 -> 1.99 vs 2.0 -> dt 0.01: yes; 2.5 -> 3.5 vs 3.0 -> 0.5: no
    assert pairs == [(1, 1)]


def test_load_depth_points_roundtrip(tmp_path):
    pts = np.array([[5, 7, 2.5], [10, 3, 4.0]])
    p = tmp_path / "d.txt"
    np.savetxt(p, pts)
    m = dsec.load_depth_points(str(p), (20, 20))
    assert m[7, 5] == 2.5 and m[3, 10] == 4.0
    assert m.mask.sum() == 20 * 20 - 2


def test_load_depth_points_thicken_edges(tmp_path):
    """The evaluator's optional 3x3-ellipse erosion
    (evaluate_mcemvs_dsec.py:64-77): each semi-dense point spreads its
    depth (the local min over 255-invalid neighbors) into the 4-connected
    neighborhood; matches cv2's morphologyEx when cv2 is present."""
    pts = np.array([[5, 7, 2.5], [10, 3, 4.0]])
    p = tmp_path / "d.txt"
    np.savetxt(p, pts)
    m = dsec.load_depth_points(str(p), (20, 20), thicken_edges=True)
    # The point and its plus-neighbors carry the depth...
    for (y, x) in [(7, 5), (6, 5), (8, 5), (7, 4), (7, 6)]:
        assert m[y, x] == 2.5
    # ...diagonal neighbors do not (the 3x3 ellipse element is a cross).
    assert m.mask[6, 4] and m.mask[8, 6]
    assert (~m.mask).sum() == 2 * 5

    cv2 = pytest.importorskip("cv2")
    raw = np.full((20, 20), 255.0)
    raw[7, 5], raw[3, 10] = 2.5, 4.0
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    want = cv2.morphologyEx(raw, cv2.MORPH_ERODE, k)
    np.testing.assert_array_equal(np.asarray(m.filled(255.0)), want)


def test_evaluate_sequence():
    H, W = 8, 8
    gt = np.ma.array(np.full((H, W), 2.0))
    est = np.ma.array(np.full((H, W), 2.1))
    rig = dsec.DsecEvalRig(Q=np.eye(4), T_rect0_0=np.eye(4),
                           K_target=np.diag([500.0, 500.0, 1.0]), baseline=0.6)
    out = dsec.evaluate_sequence([est, est], [gt, gt], rig)
    assert out["frames"] == 2
    assert out["mean_err"] == pytest.approx(0.1, rel=1e-6)
    assert out["metrics"].count == 2 * H * W


def test_evaluate_dsec_driver(tmp_path):
    """The runnable eval driver turns a run dir + GT folder into metrics
    (parity with evaluate_mcemvs_dsec.py's walk/match/consolidate flow)."""
    import json
    import subprocess
    import sys

    run = tmp_path / "run"
    gt = tmp_path / "gt"
    run.mkdir(); gt.mkdir()
    rng = np.random.default_rng(0)
    H, W = 24, 32
    gt_times_us = []
    for k, t in enumerate([0.5, 1.5, 2.5]):
        depth = rng.uniform(2.0, 5.0, (H, W))
        ys, xs = np.nonzero(rng.random((H, W)) < 0.3)
        est = depth[ys, xs] + rng.normal(0, 0.05, ys.size)  # noisy estimate
        pts = np.stack([xs, ys, est], 1)
        np.savetxt(run / f"{t:013.9f}depth_points_fused.txt", pts)
        np.save(gt / f"{k:06d}.npy", depth)
        gt_times_us.append(t * 1e6)
    # one unmatched GT frame far in time
    gt_times_us.append(50e6)
    np.save(gt / "000003.npy", np.ones((H, W)))
    ts_file = tmp_path / "ts.txt"
    np.savetxt(ts_file, np.asarray(gt_times_us))

    out = subprocess.run(
        [sys.executable, "scripts/evaluate_dsec.py",
         "--run_dir", str(run), "--gt_timestamps", str(ts_file),
         "--gt_depth_npy_dir", str(gt), "--width", str(W), "--height", str(H),
         "--fx", "100.0"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["frames_evaluated"] == 3
    assert rep["mean_err"] < 0.1
    assert 0.9 < rep["delta1"] <= 1.0
