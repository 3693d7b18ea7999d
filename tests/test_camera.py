"""Camera model: rectification LUT vs OpenCV, analytic device rectification.

The LUT builder replaces `precomputeRectifiedPoints`
(reference src/mapper_emvs_stereo.cpp:244-299), which uses
cv::undistortPoints (plumb_bob) / cv::fisheye::undistortPoints (fisheye);
parity with cv2 is the correctness bar.  The device path
(`rectify_events_device`) must match the LUT to float32 precision.
"""

import numpy as np
import pytest

from dvs_mcemvs_tpu.ops import camera as C

RADTAN_D = (-0.28, 0.07, 1.5e-4, -2.0e-4, 0.0)
FISHEYE_D = (0.02, -0.01, 0.003, -0.001)


def _cam(model, D, R=None):
    return C.PinholeCamera(
        width=64, height=48, fx=60.0, fy=61.0, cx=31.5, cy=23.5,
        distortion_model=model, D=D, R=R,
        P_fx=55.0, P_fy=56.0, P_cx=32.0, P_cy=24.0,
    )


def test_lut_matches_opencv_radtan():
    cv2 = pytest.importorskip("cv2")
    cam = _cam(C.PLUMB_BOB, RADTAN_D)
    lut = C.rectify_lut(cam).reshape(48, 64, 2)
    pts = np.array([[3.0, 4.0], [31.0, 23.0], [60.0, 40.0]], np.float64)
    out = cv2.undistortPoints(
        pts.reshape(-1, 1, 2), cam.K, np.array(cam.D), R=np.eye(3), P=cam.P
    ).reshape(-1, 2)
    got = np.array([lut[int(y), int(x)] for x, y in pts])
    np.testing.assert_allclose(got, out, atol=2e-3)


def test_lut_matches_opencv_fisheye():
    cv2 = pytest.importorskip("cv2")
    cam = _cam(C.FISHEYE, FISHEYE_D)
    lut = C.rectify_lut(cam).reshape(48, 64, 2)
    pts = np.array([[3.0, 4.0], [31.0, 23.0], [60.0, 40.0]], np.float64)
    out = cv2.fisheye.undistortPoints(
        pts.reshape(-1, 1, 2), cam.K, np.array(cam.D), R=np.eye(3), P=cam.P
    ).reshape(-1, 2)
    got = np.array([lut[int(y), int(x)] for x, y in pts])
    np.testing.assert_allclose(got, out, atol=2e-3)


@pytest.mark.parametrize("model,D", [
    (C.NONE, ()),
    (C.PLUMB_BOB, RADTAN_D),
    (C.FISHEYE, FISHEYE_D),
])
def test_device_rectify_matches_lut(model, D):
    import jax.numpy as jnp

    cam = _cam(model, D)
    lut = C.rectify_lut(cam)
    rng = np.random.default_rng(0)
    x = rng.integers(0, cam.width, 500)
    y = rng.integers(0, cam.height, 500)
    u, v = C.rectify_events_device(jnp.asarray(x), jnp.asarray(y),
                                   C.rect_static(cam))
    want = lut[y * cam.width + x]
    np.testing.assert_allclose(np.asarray(u), want[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), want[:, 1], atol=1e-3)


def test_device_rectify_with_rotation():
    import jax.numpy as jnp

    ang = 0.02
    R = (np.cos(ang), 0.0, np.sin(ang),
         0.0, 1.0, 0.0,
         -np.sin(ang), 0.0, np.cos(ang))
    cam = _cam(C.PLUMB_BOB, RADTAN_D, R=R)
    lut = C.rectify_lut(cam)
    x = np.arange(0, 64, 7)
    y = np.arange(0, 48, 5)[: len(x)]
    u, v = C.rectify_events_device(jnp.asarray(x), jnp.asarray(y),
                                   C.rect_static(cam))
    want = lut[y * cam.width + x]
    np.testing.assert_allclose(np.asarray(u), want[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), want[:, 1], atol=1e-3)


def test_virtual_camera_rules():
    cam = _cam(C.NONE, ())
    # fov < 10 -> adopt the rectified focal length; principal point from P.
    v1 = C.virtual_camera(64, 48, 0.0, cam)
    assert v1.fx == pytest.approx(55.0)
    assert (v1.cx, v1.cy) == (32.0, 24.0)
    # explicit fov -> f = 0.5 * dimX / tan(fov/2)
    v2 = C.virtual_camera(64, 48, 90.0, cam)
    assert v2.fx == pytest.approx(32.0, rel=1e-6)
