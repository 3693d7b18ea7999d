#!/usr/bin/env python
"""Scatter-plot a point cloud saved by `outputs`/`pointcloud.save_pcd`.

Matplotlib equivalent of the reference's
mapper_emvs_stereo/scripts/visualize_pointcloud.py (pypcd + 3D scatter).
Reads the ASCII PCD written by `dvs_mcemvs_tpu.ops.pointcloud.save_pcd`
(fields x y z intensity).

Usage:
  python scripts/visualize_pointcloud.py cloud.pcd [--out cloud.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def read_pcd_ascii(path: str) -> np.ndarray:
    """Minimal ASCII PCD reader for x/y/z[/intensity] clouds."""
    data_started = False
    rows = []
    with open(path) as f:
        for line in f:
            if data_started:
                rows.append([float(v) for v in line.split()])
            elif line.startswith("DATA"):
                if "ascii" not in line:
                    raise ValueError("only ASCII PCD supported")
                data_started = True
    return np.asarray(rows, dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pcd")
    ap.add_argument("--out", default="")
    ap.add_argument("--max-points", type=int, default=200_000)
    ap.add_argument("--azim", type=float, default=-60.0)
    ap.add_argument("--elev", type=float, default=-40.0)
    args = ap.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = read_pcd_ascii(args.pcd)
    if pts.shape[0] > args.max_points:
        sel = np.random.default_rng(0).choice(
            pts.shape[0], args.max_points, replace=False)
        pts = pts[sel]
    c = pts[:, 3] if pts.shape[1] > 3 else pts[:, 2]

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c, s=0.5, cmap="jet")
    ax.view_init(elev=args.elev, azim=args.azim)
    ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
