#!/usr/bin/env python
"""Convert detection proposals to instant-ngp bounding-box json
(reference: nerf_rpn/scripts/proposals2ngp.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerf_mae_tpu.viz import save_ngp_boxes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proposals_npz", required=True,
                   help="npz with per-scene 'proposals' [N, 6] (+ 'scores')")
    p.add_argument("--features_npz", required=True,
                   help="scene npz with resolution/bbox/scale/offset metadata")
    p.add_argument("--output", required=True)
    p.add_argument("--top_n", default=None, type=int)
    p.add_argument("--score_thresh", default=None, type=float)
    args = p.parse_args()

    with np.load(args.proposals_npz) as f:
        proposals = f["proposals"]
        scores = f["scores"] if "scores" in f.files else None
    if scores is not None:
        order = np.argsort(-scores)
        proposals, scores = proposals[order], scores[order]
        if args.score_thresh is not None:
            keep = scores >= args.score_thresh
            proposals = proposals[keep]
    if args.top_n:
        proposals = proposals[: args.top_n]

    with np.load(args.features_npz) as f:
        meta = {k: f[k] for k in f.files if k != "rgbsigma"}
    save_ngp_boxes(args.output, proposals, meta)
    print(f"wrote {len(proposals)} boxes to {args.output}")


if __name__ == "__main__":
    main()
