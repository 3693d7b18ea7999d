import textwrap

import numpy as np
import pytest

from dvs_mcemvs_tpu.io import calib


def test_esim_rig():
    rig = calib.load_calibration("esim")
    assert rig.num_cameras == 2
    assert rig.cams[0].width == 240 and rig.cams[0].height == 180
    assert rig.cams[0].fx == 200.0
    np.testing.assert_allclose(rig.T_1_0[0, 3], -0.2)
    np.testing.assert_allclose(rig.T_hand_eye, np.eye(4))


def test_eccv18_shared_projection():
    rig = calib.load_calibration("eccv18")
    # Both cameras must share cam0's rectified P (calib.cpp:981-982).
    np.testing.assert_allclose(rig.cams[0].P, rig.cams[1].P)
    assert rig.cams[1].fx != rig.cams[0].fx  # raw K differs
    assert rig.cams[0].P[0, 0] == pytest.approx(156.925)
    assert rig.T_hand_eye[1, 0] == pytest.approx(0.8433577587813513)


def test_dvsgen3_fisheye():
    rig = calib.load_calibration("dvsgen3")
    assert rig.cams[0].distortion_model == "fisheye"
    np.testing.assert_allclose(np.diag(rig.T_hand_eye), [-1, -1, 1, 1])


def test_evimo2_trinocular():
    rig = calib.load_calibration("evimo2")
    assert rig.num_cameras == 3
    assert rig.T_2_0 is not None
    np.testing.assert_allclose(rig.cams[1].P, rig.cams[0].P)
    np.testing.assert_allclose(rig.cams[2].P, rig.cams[0].P)
    # T_hand_eye is the body->cam0 RPY pose.
    np.testing.assert_allclose(rig.T_hand_eye[:3, 3],
                               [0.135419, -0.0214639, -0.0715952])
    # R = Rz(yaw) Ry(pitch) Rx(roll) must be a rotation.
    R = rig.T_hand_eye[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


KALIBR_YAML = textwrap.dedent("""\
    cam0:
      resolution: [346, 260]
      intrinsics: [226.38, 226.15, 173.64, 133.73]
      distortion_model: radtan
      distortion_coeffs: [-0.048, 0.011, -0.0055, 0.0006]
      projection_matrix:
      - [199.6, 0.0, 177.3, 0.0]
      - [0.0, 199.6, 126.9, 0.0]
      - [0.0, 0.0, 1.0, 0.0]
    cam1:
      resolution: [346, 260]
      intrinsics: [226.0, 225.7, 171.4, 130.9]
      distortion_model: radtan
      distortion_coeffs: [-0.047, 0.011, -0.0051, 0.0007]
      T_cn_cnm1:
      - [0.9999, 0.0001, 0.0129, -0.0999]
      - [-0.0001, 1.0, 0.0003, -0.0002]
      - [-0.0129, -0.0003, 0.9999, -0.0010]
      - [0.0, 0.0, 0.0, 1.0]
""")


def test_kalibr_yaml_mvsec(tmp_path):
    p = tmp_path / "camchain.yaml"
    p.write_text(KALIBR_YAML)
    rig = calib.load_calibration("yaml_mvsec", str(p))
    assert rig.cams[0].P[0, 0] == pytest.approx(199.6)
    np.testing.assert_allclose(rig.cams[1].P, rig.cams[0].P)
    assert rig.T_1_0[0, 3] == pytest.approx(-0.0999)  # NOT inverted
    # m3ed uses the same loader
    rig2 = calib.load_calibration("yaml_m3ed", str(p))
    np.testing.assert_allclose(rig2.T_1_0, rig.T_1_0)


def test_sony_inverts_extrinsics_and_swaps(tmp_path):
    p = tmp_path / "camchain.yaml"
    p.write_text(KALIBR_YAML)
    rig = calib.load_calibration("sony", str(p))
    plain = calib.load_calibration("yaml_mvsec", str(p))
    np.testing.assert_allclose(rig.T_1_0, np.linalg.inv(plain.T_1_0), atol=1e-12)
    # camera order swapped: sony's cam0 has yaml cam1's intrinsics
    assert rig.cams[0].fx == pytest.approx(226.0)


DSEC_YAML = textwrap.dedent("""\
    intrinsics:
      cam0:
        camera_type: event
        resolution: [640, 480]
        camera_matrix: [553.0, 553.2, 346.6, 216.5]
        distortion_model: radtan
        distortion_coeffs: [-0.09, 0.02, 0.0001, 0.0002]
      cam3:
        camera_type: event
        resolution: [640, 480]
        camera_matrix: [552.0, 552.1, 325.2, 240.3]
        distortion_model: radtan
        distortion_coeffs: [-0.08, 0.018, 0.0002, 0.0001]
    extrinsics:
      T_32:
      - [1.0, 0.0, 0.0, -0.2]
      - [0.0, 1.0, 0.0, 0.0]
      - [0.0, 0.0, 1.0, 0.0]
      - [0.0, 0.0, 0.0, 1.0]
      T_21:
      - [1.0, 0.0, 0.0, -0.2]
      - [0.0, 1.0, 0.0, 0.0]
      - [0.0, 0.0, 1.0, 0.0]
      - [0.0, 0.0, 0.0, 1.0]
      T_10:
      - [1.0, 0.0, 0.0, -0.2]
      - [0.0, 1.0, 0.0, 0.0]
      - [0.0, 0.0, 1.0, 0.0]
      - [0.0, 0.0, 0.0, 1.0]
      R_rect1:
      - [1.0, 0.0, 0.0]
      - [0.0, 1.0, 0.0]
      - [0.0, 0.0, 1.0]
""")

DSEC_MOCAP_YAML = textwrap.dedent("""\
    T_lidar_camRect1:
    - [1.0, 0.0, 0.0, 0.01]
    - [0.0, 1.0, 0.0, 0.02]
    - [0.0, 0.0, 1.0, 0.03]
    - [0.0, 0.0, 0.0, 1.0]
""")


def test_dsec_yaml_chain(tmp_path):
    pytest.importorskip("cv2")
    c = tmp_path / "cam_to_cam.yaml"
    c.write_text(DSEC_YAML)
    m = tmp_path / "cam_to_lidar.yaml"
    m.write_text(DSEC_MOCAP_YAML)
    rig = calib.load_calibration("dsec_yaml", str(c), str(m))
    # chain T_32 @ T_21 @ T_10: translation accumulates to -0.6
    assert rig.T_1_0[0, 3] == pytest.approx(-0.6)
    assert rig.T_hand_eye[0, 3] == pytest.approx(0.01 - 0.2)
    np.testing.assert_allclose(rig.cams[1].P, rig.cams[0].P)


TUMVIE_JSON = """{
  "value0": {
    "T_imu_cam": [
      {"px": 0, "py": 0, "pz": 0, "qx": 0, "qy": 0, "qz": 0, "qw": 1},
      {"px": 0, "py": 0, "pz": 0, "qx": 0, "qy": 0, "qz": 0, "qw": 1},
      {"px": 0.1, "py": 0.0, "pz": 0.0, "qx": 0, "qy": 0, "qz": 0, "qw": 1},
      {"px": -0.02, "py": 0.0, "pz": 0.0, "qx": 0, "qy": 0, "qz": 0, "qw": 1}
    ],
    "intrinsics": [
      {"camera_type": "kb4", "intrinsics": {"fx": 1, "fy": 1, "cx": 1, "cy": 1, "k1": 0, "k2": 0, "k3": 0, "k4": 0}},
      {"camera_type": "kb4", "intrinsics": {"fx": 1, "fy": 1, "cx": 1, "cy": 1, "k1": 0, "k2": 0, "k3": 0, "k4": 0}},
      {"camera_type": "kb4", "intrinsics": {"fx": 747.9, "fy": 747.3, "cx": 638.4, "cy": 373.1, "k1": 0.019, "k2": 0.0007, "k3": -0.0006, "k4": 0.0}},
      {"camera_type": "kb4", "intrinsics": {"fx": 742.5, "fy": 742.1, "cx": 618.8, "cy": 376.9, "k1": 0.019, "k2": 0.0014, "k3": -0.0011, "k4": 0.0}}
    ],
    "resolution": [[1024, 1024], [1024, 1024], [1280, 720], [1280, 720]]
  }
}"""


def test_tumvie_json(tmp_path):
    p = tmp_path / "calib.json"
    p.write_text(TUMVIE_JSON)
    rig = calib.load_calibration("json", str(p))
    assert rig.cams[0].width == 1280 and rig.cams[0].height == 720
    assert rig.cams[0].distortion_model == "fisheye"
    # virtual P = 0.8 * f
    assert rig.cams[0].P[0, 0] == pytest.approx(0.8 * 747.9)
    np.testing.assert_allclose(rig.cams[1].P, rig.cams[0].P)
    # T_1_0 = inv(T_imu_cam3) @ T_imu_cam2: translation 0.1 - (-0.02) = 0.12
    assert rig.T_1_0[0, 3] == pytest.approx(0.12)
    # hand-eye defaults to T_imu_cam0 (event cam index 2)
    assert rig.T_hand_eye[0, 3] == pytest.approx(0.1)


def test_unknown_calib_type():
    with pytest.raises(ValueError):
        calib.load_calibration("nope")


@pytest.mark.parametrize("name,fx0,t21x", [
    ("dsec_zurich04a", 553.4686750102932, -0.5092603987305321),
    ("dsec_interlaken00b", 555.6627242364661, -0.5094961871754736),
])
def test_dsec_hardcoded_rigs(name, fx0, t21x):
    """The two per-sequence hard-coded DSEC rigs (calib.cpp:459-587;
    unreachable from the reference's main, dispatched here)."""
    rig = calib.load_calibration(name)
    assert rig.num_cameras == 2
    assert rig.cams[0].fx == pytest.approx(fx0)
    # Shared rectified P (the rig convention, calib.cpp:106-108).
    np.testing.assert_allclose(rig.cams[1].P, rig.cams[0].P)
    # T_1_0 = T_32 T_21 T_10: dominated by T_21's ~0.51 m stereo baseline.
    assert abs(rig.T_1_0[0, 3] - t21x) < 0.12
    # Hand-eye carries the LiDAR offset (0.448, 0.255, -0.215).
    assert abs(rig.T_hand_eye[0, 3] - 0.448) < 0.06
    # Rotations orthonormal.
    for T in (rig.T_1_0, rig.T_hand_eye):
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
