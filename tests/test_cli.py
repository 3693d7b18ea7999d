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
        "--num_intervals=2", "--nosave_pointcloud",
    ])
    assert rc == 0
    assert any(f.endswith("depth_points_fused.txt") for f in os.listdir(out))


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
