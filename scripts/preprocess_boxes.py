#!/usr/bin/env python
"""Convert world-space box annotations to grid-voxel-space .npy box files.

Counterpart of the reference's per-dataset preprocess_boxes.py
(reference: data/hm3d/preprocess_boxes.py:17-330, same math in
data/hypersim/preprocess_boxes.py): annotation json ({"bounding_boxes":
[{position, orientation, extents}]} for OBBs or {"instances": [{min_pt,
max_pt}]} for AABBs) + the scene npz metadata (resolution/bbox/scale/offset/
from_mitsuba) -> [N, 7] (x, y, z, w, l, h, theta) or [N, 6] AABB in voxel
coordinates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PERM = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float64)


def nerf_matrix_to_ngp(m, scale, offset, from_mitsuba):
    """(reference: preprocess_boxes.py nerf_matrix_to_ngp)"""
    out = m.copy()
    out[:, [1, 2]] *= -1
    out[:, 3] = out[:, 3] * scale + offset
    if from_mitsuba:
        out[:, [0, 2]] *= -1
    else:
        out = out[[1, 2, 0], :]
    return out


def _res3(meta):
    r = np.asarray(meta["resolution"], np.float64).reshape(-1)
    return np.full(3, r[0]) if r.size == 1 else r


def process_obbs(ann: dict, meta: dict) -> np.ndarray:
    """World OBBs -> voxel-space [N, 7]
    (reference: preprocess_boxes.py:199-272 process_obbs)."""
    grid_res = PERM @ _res3(meta)
    bbox_min = PERM @ np.asarray(meta["bbox_min"], np.float64)
    bbox_max = PERM @ np.asarray(meta["bbox_max"], np.float64)
    diag = bbox_max - bbox_min
    grid_res_out = np.array([grid_res[1], grid_res[2], grid_res[0]])
    scale = float(meta["scale"])
    offset = np.asarray(meta["offset"], np.float64)
    fm = bool(meta.get("from_mitsuba", False))

    boxes = []
    for obj in ann["bounding_boxes"]:
        extent = np.asarray(obj["extents"], np.float64)
        xform = np.hstack([
            np.asarray(obj["orientation"], np.float64),
            np.asarray(obj["position"], np.float64)[:, None],
        ])
        xform = nerf_matrix_to_ngp(xform, scale, offset, fm)
        extent = extent * scale
        xform = PERM @ xform
        position = xform[:, 3]
        theta = (
            np.pi / 2 if xform[0, 0] == 0
            else np.arctan(xform[1, 0] / xform[0, 0])
        )
        position = (position - bbox_min) / diag * grid_res_out
        extent = extent / diag * grid_res_out
        boxes.append(np.concatenate([position, extent, [theta]]))
    return np.asarray(boxes, np.float32).reshape(-1, 7)


def process_aabbs(ann: dict, meta: dict, min_size: float = 0.0) -> np.ndarray:
    """World AABBs ({"instances": [{min_pt, max_pt}]}) -> voxel [N, 6]
    (reference: preprocess_boxes.py process_ngp_transforms +
    transform_to_ngp_bbox)."""
    grid_res = _res3(meta)
    bbox_min = np.asarray(meta["bbox_min"], np.float64)
    bbox_max = np.asarray(meta["bbox_max"], np.float64)
    diag = bbox_max - bbox_min
    scale = float(meta["scale"])
    offset = np.asarray(meta["offset"], np.float64)
    fm = bool(meta.get("from_mitsuba", False))

    corners_unit = np.array(
        [[1, 1, 1], [1, 1, -1], [1, -1, -1], [1, -1, 1],
         [-1, 1, 1], [-1, 1, -1], [-1, -1, -1], [-1, -1, 1]], np.float64
    ).T

    boxes = []
    for inst in ann["instances"]:
        lo = np.asarray(inst["min_pt"], np.float64)
        hi = np.asarray(inst["max_pt"], np.float64)
        extent = (hi - lo) * scale
        position = (lo + hi) / 2
        xform = np.hstack([np.eye(3), position[:, None]])
        xform = nerf_matrix_to_ngp(xform, scale, offset, fm)
        c = xform[:, :3] @ (corners_unit * extent[:, None] * 0.5) + xform[:, 3:4]
        mn, mx = c.min(1), c.max(1)
        vox_lo = (mn - bbox_min) / diag * grid_res
        vox_hi = (mx - bbox_min) / diag * grid_res
        vox_lo = np.clip(vox_lo, 0, grid_res)
        vox_hi = np.clip(vox_hi, 0, grid_res)
        if (vox_hi - vox_lo).min() >= min_size:
            boxes.append(np.concatenate([vox_lo, vox_hi]))
    return np.asarray(boxes, np.float32).reshape(-1, 6)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True, help="annotation json")
    p.add_argument("--features_npz", required=True, help="scene npz (metadata)")
    p.add_argument("--output", required=True, help="output .npy boxes")
    p.add_argument("--format", default="obb", choices=["obb", "aabb"])
    p.add_argument("--min_size", default=0.0, type=float)
    args = p.parse_args(argv)

    with open(args.annotations) as f:
        ann = json.load(f)
    with np.load(args.features_npz) as f:
        meta = {k: f[k] for k in f.files if k != "rgbsigma"}
    boxes = (
        process_obbs(ann, meta) if args.format == "obb"
        else process_aabbs(ann, meta, args.min_size)
    )
    np.save(args.output, boxes)
    print(f"wrote {boxes.shape} boxes to {args.output}")


if __name__ == "__main__":
    main()
