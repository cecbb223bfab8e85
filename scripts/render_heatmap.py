#!/usr/bin/env python
"""Render per-voxel objectness heatmaps to PNG slice mosaics
(reference: nerf_rpn/scripts/render_heatmap.py — open3d volumetric rendering
replaced by headless matplotlib slice grids)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scores_npz", required=True,
                   help="npz of per-level objectness grids (run_fcos "
                        "--output_voxel_scores output)")
    p.add_argument("--level", default="0")
    p.add_argument("--output", required=True)
    p.add_argument("--n_slices", default=16, type=int)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with np.load(args.scores_npz) as f:
        grid = f[args.level]
    w, l, h = grid.shape
    n = min(args.n_slices, h)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    zs = np.linspace(0, h - 1, n).astype(int)
    for ax, z in zip(axes, zs):
        ax.imshow(grid[:, :, z].T, origin="lower", vmin=0, vmax=1, cmap="inferno")
        ax.set_title(f"z={z}", fontsize=7)
        ax.axis("off")
    for ax in axes[n:]:
        ax.axis("off")
    fig.suptitle(f"objectness level {args.level} ({w}x{l}x{h})")
    fig.tight_layout()
    fig.savefig(args.output, dpi=110)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
