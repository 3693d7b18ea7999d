#!/usr/bin/env python
"""Convert pose files between formats (TUM txt / npz / rosbag -> npz or TUM).

Equivalent of the reference's scripts/mocap_txt2bag.py (TUM-VIE mocap txt to
rosbag), retargeted at the framework's native pose containers: rosbags are
replaced by npz pose stores (`t`, `q` wxyz, `p`), which every pipeline entry
point reads directly.

Usage:
  python scripts/convert_poses.py mocap.txt poses.npz
  python scripts/convert_poses.py pose.bag poses.npz --topic /pose
  python scripts/convert_poses.py poses.npz poses.txt
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dvs_mcemvs_tpu.io import poses as posesio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help=".txt (TUM), .npz, or .bag pose file")
    ap.add_argument("dst", help="output .npz or .txt (TUM)")
    ap.add_argument("--topic", default="", help="pose topic for rosbag input")
    args = ap.parse_args()

    traj = posesio.read_poses(args.src, topic=args.topic)
    ts = np.asarray(traj.ts, np.float64)
    q = np.asarray(traj.poses.q, np.float64)  # wxyz
    p = np.asarray(traj.poses.t, np.float64)

    if args.dst.endswith(".npz"):
        np.savez(args.dst, t=ts, q=q, p=p)
    elif args.dst.endswith(".txt"):
        q_xyzw = q[:, [1, 2, 3, 0]]
        with open(args.dst, "w") as f:
            f.write("# t x y z qx qy qz qw\n")
            for i in range(len(ts)):
                f.write("%.9f %.6f %.6f %.6f %.9f %.9f %.9f %.9f\n" % (
                    ts[i], *p[i], *q_xyzw[i]))
    else:
        raise SystemExit(f"unsupported output format: {args.dst}")
    print(f"wrote {args.dst} ({len(ts)} poses)")


if __name__ == "__main__":
    main()
