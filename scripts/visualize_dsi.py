#!/usr/bin/env python
"""Visualize a saved DSI .npy volume: slice mosaics, MIP projections, and a
3D volume rendering.

Matplotlib equivalent of the reference's visvis viewers
(mapper_emvs_stereo/scripts/visualize_dsi_slices.py and
visualize_dsi_volume.py): the slice view pages through depth planes, the mip
view shows maximum-intensity projections along each axis, and the volume
view renders the ray-density volume in 3D (intensity-thresholded voxel
cloud with opacity ~ vote count — the matplotlib stand-in for visvis's
`volshow`, visualize_dsi_volume.py:30-38).

Usage:
  python scripts/visualize_dsi.py dsi.npy --mode slices --out slices.png
  python scripts/visualize_dsi.py dsi.npy --mode mip --out mip.png
  python scripts/visualize_dsi.py dsi.npy --mode volume --out volume.png
  python scripts/visualize_dsi.py dsi.npy --mode volume     # interactive
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def plot_slices(dsi: np.ndarray, cols: int = 5, cmap: str = "viridis"):
    import matplotlib.pyplot as plt

    Z = dsi.shape[0]
    step = max(1, Z // (cols * cols))
    idx = list(range(0, Z, step))[: cols * cols]
    rows = -(-len(idx) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.4 * rows))
    vmax = np.percentile(dsi, 99.5)
    for ax, z in zip(np.ravel(axes), idx):
        ax.imshow(dsi[z], cmap=cmap, vmin=0, vmax=vmax)
        ax.set_title(f"z={z}", fontsize=8)
        ax.axis("off")
    for ax in np.ravel(axes)[len(idx):]:
        ax.axis("off")
    fig.tight_layout()
    return fig


def plot_mip(dsi: np.ndarray, cmap: str = "viridis"):
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, (axis, name) in zip(axes, [(0, "XY (over Z)"),
                                       (1, "XZ (over Y)"),
                                       (2, "YZ (over X)")]):
        mip = dsi.max(axis=axis)
        ax.imshow(mip, cmap=cmap, aspect="auto")
        ax.set_title(f"MIP {name}")
    fig.tight_layout()
    return fig


def plot_volume(dsi: np.ndarray, quantile: float = 0.995,
                max_points: int = 60_000, cmap: str = "viridis",
                elev: float = 20.0, azim: float = -60.0):
    """3D volume rendering: voxels above the intensity quantile, drawn as a
    point cloud with opacity and color scaled by vote count (brightest =
    most ray intersections, the structure the visvis volume renderer shows).
    Subsamples uniformly above `max_points` to keep rendering interactive.
    """
    import matplotlib.pyplot as plt

    thr = np.quantile(dsi, quantile)
    z, y, x = np.nonzero(dsi > thr)
    vals = dsi[z, y, x]
    if z.size == 0:
        raise SystemExit(f"no voxels above the {quantile:.3%} quantile "
                         f"({thr:.3g}) — lower --quantile")
    if z.size > max_points:
        keep = np.random.default_rng(0).choice(z.size, max_points,
                                               replace=False)
        z, y, x, vals = z[keep], y[keep], x[keep], vals[keep]

    vmax = np.percentile(vals, 99.5)
    norm = np.clip(vals / max(vmax, 1e-12), 0.0, 1.0)
    fig = plt.figure(figsize=(9, 7))
    ax = fig.add_subplot(projection="3d")
    sc = ax.scatter(x, y, z, c=vals, cmap=cmap, s=1.5,
                    alpha=None, marker=".",
                    vmin=float(thr), vmax=float(vmax))
    # Per-point opacity ~ intensity (front voxels do not fully occlude).
    colors = sc.cmap(sc.norm(vals))
    colors[:, 3] = 0.15 + 0.85 * norm
    sc.set_facecolor(colors)
    ax.set_xlabel("x (px)")
    ax.set_ylabel("y (px)")
    ax.set_zlabel("z (plane)")
    ax.set_box_aspect((dsi.shape[2], dsi.shape[1], 1.5 * dsi.shape[0]))
    ax.invert_yaxis()  # image convention: y down
    ax.view_init(elev=elev, azim=azim)
    fig.colorbar(sc, ax=ax, shrink=0.6, label="ray density")
    ax.set_title(f"DSI volume — {z.size} voxels above "
                 f"q{quantile:.3f} ({thr:.3g})")
    fig.tight_layout()
    return fig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npy", help="DSI volume saved by write_dsi_npy (Z, H, W)")
    ap.add_argument("--mode", choices=["slices", "mip", "volume"],
                    default="mip")
    ap.add_argument("--out", default="", help="save PNG instead of showing")
    ap.add_argument("--cmap", default="viridis")
    ap.add_argument("--quantile", type=float, default=0.995,
                    help="volume mode: render voxels above this intensity "
                         "quantile")
    ap.add_argument("--max-points", type=int, default=60_000,
                    help="volume mode: subsample cap on rendered voxels")
    args = ap.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dsi = np.load(args.npy)
    assert dsi.ndim == 3, f"expected (Z, H, W), got {dsi.shape}"
    if args.mode == "slices":
        fig = plot_slices(dsi, cmap=args.cmap)
    elif args.mode == "volume":
        fig = plot_volume(dsi, quantile=args.quantile,
                          max_points=args.max_points, cmap=args.cmap)
    else:
        fig = plot_mip(dsi, cmap=args.cmap)
    if args.out:
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
