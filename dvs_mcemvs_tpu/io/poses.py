"""Pose-stream readers → `Trajectory`.

Replaces the rosbag pose ingest (reference: mapper_emvs_stereo/src/
data_loading.cpp:305-465, which handles vicon/Subject, PoseStamped,
PoseWithCovarianceStamped and Odometry messages) with the common offline
formats: TUM trajectory text files, npz arrays, and (gated) rosbags.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import trajectory as trajmod
from .events import TimeOrigin


def _build(ts, q_wxyz, t_xyz, t_start, t_stop, origin) -> trajmod.Trajectory:
    ts = np.asarray(ts, np.float64)
    if origin is not None:
        ts = origin.normalize(ts)
    keep = (ts >= t_start) & (ts <= t_stop)
    return trajmod.from_arrays(ts[keep], np.asarray(q_wxyz)[keep], np.asarray(t_xyz)[keep])


def read_poses_tum(
    path: str,
    t_start: float = -1e19,
    t_stop: float = 1e19,
    origin: Optional[TimeOrigin] = None,
) -> trajmod.Trajectory:
    """TUM format: `t x y z qx qy qz qw` per line (the output of the
    reference's scripts/mocap_txt2bag.py converter, inverted)."""
    data = np.loadtxt(path, comments="#")
    if data.ndim == 1:
        data = data[None, :]
    ts = data[:, 0]
    t_xyz = data[:, 1:4]
    q_xyzw = data[:, 4:8]
    q_wxyz = q_xyzw[:, [3, 0, 1, 2]]
    return _build(ts, q_wxyz, t_xyz, t_start, t_stop, origin)


def read_poses_npz(
    path: str,
    t_start: float = -1e19,
    t_stop: float = 1e19,
    origin: Optional[TimeOrigin] = None,
) -> trajmod.Trajectory:
    """npz with `t` (N,), and either `q` (N,4 wxyz) + `p` (N,3) or
    `T` (N,4,4) homogeneous matrices."""
    data = np.load(path)
    ts = np.asarray(data["t"], np.float64)
    if "T" in data:
        mats = np.asarray(data["T"], np.float64)
        if origin is not None:
            ts = origin.normalize(ts)
        keep = (ts >= t_start) & (ts <= t_stop)
        return trajmod.from_matrices(ts[keep], mats[keep])
    return _build(ts, data["q"], data["p"], t_start, t_stop, origin)


def read_poses_rosbag(
    path: str,
    topic: str,
    t_start: float = -1e19,
    t_stop: float = 1e19,
    origin: Optional[TimeOrigin] = None,
) -> trajmod.Trajectory:
    """Pose rosbag reader covering the four message types of
    data_loading.cpp:334-463, via the native ROS1 parser (io/rosbag1.py)."""
    from . import rosbag1

    ts, qs, ps = rosbag1.read_pose_bag(path, topic)
    return _build(ts, qs, ps, t_start, t_stop, origin)


def read_poses(path: str, topic: str = "", **kwargs) -> trajmod.Trajectory:
    if path.endswith(".bag"):
        return read_poses_rosbag(path, topic, **kwargs)
    if path.endswith(".npz"):
        return read_poses_npz(path, **kwargs)
    return read_poses_tum(path, **kwargs)
