"""Native ROS1 bag reader: synthetic-bag round trips + shipped fixtures."""

import os
import struct

import numpy as np
import pytest

from dvs_mcemvs_tpu.io import rosbag1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _header(fields):
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields, data):
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_header(stamp_s, frame=b"map"):
    sec = int(stamp_s)
    nsec = int(round((stamp_s - sec) * 1e9))
    return (struct.pack("<IIi", 0, sec, nsec)[:4]
            + struct.pack("<II", sec, nsec)
            + struct.pack("<I", len(frame)) + frame)


def _write_bag(path, messages):
    """messages: list of (topic, msg_type, stamp_s, payload bytes)."""
    conns = {}
    chunk = b""
    for topic, mtype, stamp, payload in messages:
        key = (topic, mtype)
        if key not in conns:
            cid = len(conns)
            conns[key] = cid
            info = _header({"topic": topic.encode(), "type": mtype.encode(),
                            "md5sum": b"0" * 32, "message_definition": b""})
            chunk += _record({"op": b"\x07", "conn": struct.pack("<I", cid),
                              "topic": topic.encode()}, info)
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        chunk += _record({"op": b"\x02",
                          "conn": struct.pack("<I", conns[key]),
                          "time": struct.pack("<II", sec, nsec)}, payload)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x05", "compression": b"none",
                         "size": struct.pack("<I", len(chunk))}, chunk))


def _pose_stamped(stamp, t, q_wxyz):
    w, x, y, z = q_wxyz
    return (_ros_header(stamp)
            + struct.pack("<3d", *t) + struct.pack("<4d", x, y, z, w))


def _odometry(stamp, t, q_wxyz):
    w, x, y, z = q_wxyz
    child = b"base"
    return (_ros_header(stamp) + struct.pack("<I", len(child)) + child
            + struct.pack("<3d", *t) + struct.pack("<4d", x, y, z, w)
            + struct.pack("<36d", *([0.0] * 36)))


def _event_array(stamp, xs, ys, ts, ps):
    body = _ros_header(stamp) + struct.pack("<II", 48, 64)
    body += struct.pack("<I", len(xs))
    for x, y, t, p in zip(xs, ys, ts, ps):
        sec = int(t)
        nsec = int(round((t - sec) * 1e9))
        body += struct.pack("<HHIIB", x, y, sec, nsec, p)
    return body


def _camera_info(stamp):
    model = b"plumb_bob"
    K = np.arange(9, dtype=np.float64)
    R = np.eye(3).ravel()
    P = np.arange(12, dtype=np.float64)
    return (_ros_header(stamp) + struct.pack("<II", 48, 64)
            + struct.pack("<I", len(model)) + model
            + struct.pack("<I", 5) + struct.pack("<5d", *range(5))
            + struct.pack("<9d", *K) + struct.pack("<9d", *R)
            + struct.pack("<12d", *P))


def test_pose_bag_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 7
    ts = np.sort(rng.uniform(10, 20, n))
    qs = rng.normal(size=(n, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ps = rng.normal(size=(n, 3))
    msgs = [("/pose", "geometry_msgs/PoseStamped", t,
             _pose_stamped(t, p, q)) for t, q, p in zip(ts, qs, ps)]
    bag = tmp_path / "pose.bag"
    _write_bag(str(bag), msgs)

    t2, q2, p2 = rosbag1.read_pose_bag(str(bag), "/pose")
    np.testing.assert_allclose(t2, ts, atol=1e-6)
    np.testing.assert_allclose(q2, qs, atol=1e-12)
    np.testing.assert_allclose(p2, ps, atol=1e-12)

    # odometry flavor too (nav_msgs/Odometry with covariance tail)
    msgs = [("/odom", "nav_msgs/Odometry", t, _odometry(t, p, q))
            for t, q, p in zip(ts, qs, ps)]
    bag2 = tmp_path / "odom.bag"
    _write_bag(str(bag2), msgs)
    t3, q3, p3 = rosbag1.read_pose_bag(str(bag2), "/odom")
    np.testing.assert_allclose(p3, ps, atol=1e-12)
    np.testing.assert_allclose(q3, qs, atol=1e-12)


def test_event_bag_roundtrip(tmp_path):
    xs, ys = [1, 2, 3], [4, 5, 6]
    ts = [1.0, 1.5, 2.0]
    ps = [1, 0, 1]
    bag = tmp_path / "ev.bag"
    _write_bag(str(bag), [
        ("/dvs/events", "dvs_msgs/EventArray", 1.0,
         _event_array(1.0, xs[:2], ys[:2], ts[:2], ps[:2])),
        ("/dvs/events", "dvs_msgs/EventArray", 2.0,
         _event_array(2.0, xs[2:], ys[2:], ts[2:], ps[2:])),
    ])
    x, y, t, p = rosbag1.read_event_bag(str(bag), "/dvs/events")
    np.testing.assert_array_equal(x, xs)
    np.testing.assert_array_equal(y, ys)
    np.testing.assert_allclose(t, ts, atol=1e-9)
    np.testing.assert_array_equal(p, ps)

    # and through the Events front end (sorting + windowing)
    from dvs_mcemvs_tpu.io import events as eventsmod

    ev = eventsmod.read_events_rosbag(str(bag), "/dvs/events",
                                      t_start=1.2, t_stop=2.5)
    assert ev.num == 2 and ev.x.tolist() == [2, 3]


def test_camera_info_bag(tmp_path):
    bag = tmp_path / "ci.bag"
    _write_bag(str(bag), [("/cam/camera_info", "sensor_msgs/CameraInfo",
                           3.0, _camera_info(3.0))])
    info = rosbag1.read_camera_info_bag(str(bag), "/cam/camera_info")
    assert info["width"] == 64 and info["height"] == 48
    assert info["distortion_model"] == "plumb_bob"
    np.testing.assert_allclose(info["K"].ravel(), np.arange(9))
    np.testing.assert_allclose(info["D"], np.arange(5))
    np.testing.assert_allclose(info["P"].ravel(), np.arange(12))


def test_shipped_dsec_pose_fixtures():
    """The three DSEC odometry pose sets the reference ships as bags
    (data/DSEC/*/pose.bag) are committed as npz fixtures and load into
    valid trajectories."""
    from dvs_mcemvs_tpu.io import poses as posesmod

    for seq, n_min in (("interlaken_00", 13000), ("zurich_city_02", 6700),
                       ("zurich_city_04", 6200)):
        path = os.path.join(REPO, "data", "DSEC", f"{seq}_pose.npz")
        assert os.path.exists(path), path
        data = np.load(path)
        t, q, p = data["t"], data["q"], data["p"]
        assert len(t) >= n_min
        assert np.all(np.diff(t) >= 0)
        # the source odometry has a handful of slightly denormalized quats
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
        traj = posesmod.read_poses(path)
        assert traj.ts.shape[0] == len(t)
