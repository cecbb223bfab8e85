#!/usr/bin/env python
"""Headless camera/box visualizer for instant-ngp-style scenes.

Capability match for the reference's data/visualize_cameras/ viewers
(visualize_nerf_{front3d,hm3d,hypersim,scannet,arkit}.py): read each
split's transforms.json, build per-camera view frusta (the reference's
5-vertex / 8-edge topology, get_camera_frustum at
visualize_nerf_front3d.py:115-139), the scene room_bbox, and the world
OBBs, and — instead of an interactive open3d window (no display on TPU
hosts) — write everything as one ASCII PLY line set with `edge`
elements, plus optional occupied-voxel points from a feature grid.

Colors follow the reference's colored_camera_dicts: train frusta green,
val/test red; room_bbox blue; OBBs yellow.

Usage:
  python scripts/visualize_cameras.py --scene <dir> --out cams.ply \
      [--splits train val] [--subsample 8] [--frustum_length 0.1] \
      [--grid features.npz] [--forward -1]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_mae_tpu.viz import (  # noqa: E402
    _BOX_EDGES,
    box_lineset,
    camera_frustum_lineset,
    grid_to_pointcloud,
    merge_linesets,
    save_lineset_ply,
)

SPLIT_COLORS = {"train": (0.0, 1.0, 0.0), "val": (1.0, 0.0, 0.0),
                "test": (1.0, 0.0, 0.0)}


def obb_corner_lineset(obbs, color=(1.0, 0.8, 0.0)):
    """bounding_boxes entries ({extents, orientation 3x3, position}) ->
    one wireframe line set. General-rotation OBBs (the save_transforms.py
    / reference save_transforms_with_boxes.py schema), unlike
    viz.box_lineset's yaw-only [N, 7] form."""
    linesets = []
    signs = np.array(
        [[sx, sy, sz] for sz in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sx in (-0.5, 0.5)], np.float64,
    )  # [8, 3] — same corner order as viz.box_corners_3d / _BOX_EDGES
    edges = np.asarray(_BOX_EDGES, np.int64)
    for b in obbs:
        ext = np.asarray(b["extents"], np.float64)
        ori = np.asarray(b["orientation"], np.float64)
        pos = np.asarray(b["position"], np.float64)
        corners = (signs * ext) @ ori.T + pos
        colors = np.tile(np.asarray(color, np.float64)[None], (12, 1))
        linesets.append((corners.astype(np.float32), edges, colors))
    return merge_linesets(linesets)


def scene_linesets(tdict, split_color, subsample=1, frustum_length=0.1,
                   forward=-1.0, draw_boxes=True):
    """One split's transforms dict -> list of (points, lines, colors)."""
    w = float(tdict.get("w", 640.0))
    h = float(tdict.get("h", 480.0))
    if "camera_angle_x" in tdict:
        cax = float(tdict["camera_angle_x"])
    else:  # hypersim/scannet-style: focal only
        cax = 2.0 * np.arctan(w / (2.0 * float(tdict["fl_x"])))
    out = []
    for fr in tdict.get("frames", [])[::max(1, subsample)]:
        c2w = np.asarray(fr["transform_matrix"], np.float64)
        out.append(camera_frustum_lineset(
            c2w, cax, aspect=h / w, length=frustum_length,
            color=split_color, forward=forward))
    if draw_boxes:
        if "room_bbox" in tdict:
            lo, hi = tdict["room_bbox"]
            out.append(box_lineset(
                np.asarray([lo + hi], np.float32), color=(0.2, 0.4, 1.0)))
        if tdict.get("bounding_boxes"):
            out.append(obb_corner_lineset(tdict["bounding_boxes"]))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", required=True,
                    help="scene dir holding <split>/transforms.json")
    ap.add_argument("--out", required=True, help="output .ply path")
    ap.add_argument("--splits", nargs="+", default=["train"])
    ap.add_argument("--subsample", type=int, default=1,
                    help="keep every Nth frame (reference mains use ::8)")
    ap.add_argument("--frustum_length", type=float, default=0.1)
    ap.add_argument("--forward", type=float, default=-1.0,
                    help="camera-frame z-sign of the view direction: -1 "
                         "for nerf/OpenGL poses, +1 for the reference's "
                         "raw +z frusta")
    ap.add_argument("--grid", default=None,
                    help="optional features .npz (rgbsigma [+ scale/"
                         "offset]) to add occupied voxels as points")
    ap.add_argument("--alpha_thresh", type=float, default=0.01)
    ap.add_argument("--no_boxes", action="store_true")
    args = ap.parse_args(argv)

    linesets, n_frusta = [], 0
    for si, split in enumerate(args.splits):
        tpath = os.path.join(args.scene, split, "transforms.json")
        if not os.path.isfile(tpath):  # flat scene dirs: transforms at root
            tpath = os.path.join(args.scene, "transforms.json")
        with open(tpath) as f:
            tdict = json.load(f)
        ls = scene_linesets(
            tdict, SPLIT_COLORS.get(split, (0.0, 1.0, 0.0)),
            subsample=args.subsample, frustum_length=args.frustum_length,
            forward=args.forward, draw_boxes=(si == 0 and not args.no_boxes))
        n_frusta += sum(1 for p, _, _ in ls if len(p) == 5)
        linesets.extend(ls)

    points, lines, colors = merge_linesets(linesets)

    if args.grid:
        npz = np.load(args.grid)
        rgbsigma = npz["rgbsigma"]
        pc = grid_to_pointcloud(np.asarray(rgbsigma), args.alpha_thresh)
        if len(pc["points"]):
            # voxel indices -> world via the stored ngp scale/offset when
            # present (save_transforms.py ngp_scale_offset inverse)
            pts = pc["points"] + 0.5
            res = np.asarray(rgbsigma.shape[:3], np.float32)
            pts = pts / res  # [0, 1]^3 ngp cube
            if "scale" in npz and "offset" in npz:
                pts = (pts - np.asarray(npz["offset"])) / float(npz["scale"])
            points = np.concatenate([points, pts.astype(np.float32)])

    save_lineset_ply(args.out, points, lines, colors)
    print(f"wrote {args.out}: {len(points)} vertices, {len(lines)} edges, "
          f"{n_frusta} frusta")


if __name__ == "__main__":
    main()
