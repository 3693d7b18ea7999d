#!/usr/bin/env python
"""Visualize a saved DSI .npy volume: per-slice mosaics and MIP projections.

Matplotlib equivalent of the reference's visvis viewers
(mapper_emvs_stereo/scripts/visualize_dsi_slices.py and
visualize_dsi_volume.py): the slice view pages through depth planes, the
volume view shows maximum-intensity projections along each axis.

Usage:
  python scripts/visualize_dsi.py dsi.npy --mode slices --out slices.png
  python scripts/visualize_dsi.py dsi.npy --mode mip --out mip.png
  python scripts/visualize_dsi.py dsi.npy --mode mip        # interactive
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npy", help="DSI volume saved by write_dsi_npy (Z, H, W)")
    ap.add_argument("--mode", choices=["slices", "mip"], default="mip")
    ap.add_argument("--out", default="", help="save PNG instead of showing")
    ap.add_argument("--cmap", default="viridis")
    args = ap.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dsi = np.load(args.npy)
    assert dsi.ndim == 3, f"expected (Z, H, W), got {dsi.shape}"
    fig = plot_slices(dsi, cmap=args.cmap) if args.mode == "slices" \
        else plot_mip(dsi, cmap=args.cmap)
    if args.out:
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
