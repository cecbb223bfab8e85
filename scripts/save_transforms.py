#!/usr/bin/env python
"""Raw captures -> instant-ngp training layout: PCA-normalized camera poses
+ aligned world-space boxes -> transforms.json.

Counterpart of the reference's HM3D pose/box-alignment pipeline
(reference: data/hm3d/save_transforms_with_boxes.py:118-342,
save_transforms_with_all_boxes.py:380-472; Front3D/Hypersim analogues share
the coordinate conventions). Input: a scene folder of per-frame pose json
files ({"pose": 4x4 c2w}) and a box-annotation json; output: one
transforms.json whose

- frames[].transform_matrix are the camera-to-world poses re-expressed in a
  PCA frame where camera centers lie inside [-1, 1]^3 (transform_poses_pca,
  the mip-NeRF-360 normalization the reference uses — ref
  save_transforms_with_boxes.py:129-165),
- bounding_boxes are the world OBBs carried through the SAME similarity
  transform (ref :62-80 transform_bounding_boxes),
- room_bbox is the AABB hull of the transformed boxes (ref :43-60),
- scale/offset are the instant-ngp grid mapping computed from room_bbox
  (ref save_transforms_with_all_boxes.py:449-456: scale = 1.5 / max extent,
  offset = 0.5 - scale * center) so that scripts/preprocess_boxes.py (and
  instant-ngp itself) can map the normalized world into voxel coordinates.

The habitat-sim asset loading (rendering RGB frames from raw HM3D meshes)
is out of scope — it needs habitat-sim and the raw dataset (PARITY.md);
this script starts from its outputs (pose jsons + box jsons), which is
where the reference scripts start too.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# NYU40 labels the reference excludes from detection annotations
# (architectural / thin / clutter classes — ref
# save_transforms_with_boxes.py:11-35). Data constants, not code.
EXCLUDED_NYU40_LABELS = (
    "wall", "floor", "door", "window", "counter", "shelves", "curtain",
    "books", "refrigerator", "television", "paper", "towel", "box",
    "whiteboard", "person", "night stand", "sink", "bag", "bookshelf",
    "otherprop", "pillow", "otherstructure",
)

# NYU40 id -> label (ref save_transforms_with_boxes.py:40). Used when a
# category-mapping tsv maps raw class names to NYU40 ids.
NYU40_ID_TO_LABEL = {
    0: "void", 1: "wall", 2: "floor", 3: "cabinet", 4: "bed", 5: "chair",
    6: "sofa", 7: "table", 8: "door", 9: "window", 10: "bookshelf",
    11: "picture", 12: "counter", 13: "blinds", 14: "desk", 15: "shelves",
    16: "curtain", 17: "dresser", 18: "pillow", 19: "mirror",
    20: "floor mat", 21: "clothes", 22: "ceiling", 23: "books",
    24: "refridgerator", 25: "television", 26: "paper", 27: "towel",
    28: "shower curtain", 29: "box", 30: "whiteboard", 31: "person",
    32: "night stand", 33: "toilet", 34: "sink", 35: "lamp", 36: "bathtub",
    37: "bag", 38: "otherstructure", 39: "otherfurniture", 40: "otherprop",
}


def pad_poses(p: np.ndarray) -> np.ndarray:
    """[..., 3, 4] -> [..., 4, 4] with a homogeneous bottom row."""
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def transform_poses_pca(poses: np.ndarray):
    """Rotate/recenter/scale c2w poses so camera centers' principal axes
    align with XYZ and all centers lie in [-1, 1]^3. Returns
    (poses [N, 3, 4], transform [4, 4]) where transform maps original world
    points into the normalized frame (ref
    save_transforms_with_boxes.py:129-165; the mip-NeRF-360 recipe)."""
    poses = np.asarray(poses, np.float64)[:, :3, :4]
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    centered = t - t_mean

    eigval, eigvec = np.linalg.eigh(centered.T @ centered)
    eigvec = eigvec[:, np.argsort(eigval)[::-1]]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag([1.0, 1.0, -1.0]) @ rot

    transform = np.concatenate([rot, rot @ -t_mean[:, None]], axis=-1)
    poses_rec = (transform @ pad_poses(poses))[..., :3, :4]
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)

    # Keep the average camera "up" (y axis) pointing to +z in the new frame
    if poses_rec.mean(axis=0)[2, 1] < 0:
        flip = np.diag([1.0, -1.0, -1.0])
        poses_rec = flip @ poses_rec
        transform = np.diag([1.0, -1.0, -1.0, 1.0]) @ transform

    scale = 1.0 / np.max(np.abs(poses_rec[:, :3, 3]))
    poses_rec[:, :3, 3] *= scale
    transform = np.diag([scale, scale, scale, 1.0]) @ transform
    return poses_rec, transform


def similarity_parts(transform: np.ndarray):
    """Decompose the [4, 4] similarity from transform_poses_pca into
    (s, R, t) with R orthonormal: transform[:3, :3] = s * R."""
    m = transform[:3, :3]
    s = float(np.cbrt(abs(np.linalg.det(m))))
    return s, m / s, transform[:3, 3]


def transform_obbs(extents, orientations, positions, transform):
    """Carry world OBBs through the pose-normalizing similarity: positions
    map through the full transform, orientations rotate, extents scale
    (corner-identical to the reference's open3d rotate+translate with the
    scaled rotation matrix — ref save_transforms_with_boxes.py:62-80)."""
    s, R, t = similarity_parts(np.asarray(transform, np.float64))
    new_e, new_o, new_p = [], [], []
    for e, o, p in zip(extents, orientations, positions):
        new_p.append(s * (R @ np.asarray(p, np.float64)) + t)
        new_o.append(R @ np.asarray(o, np.float64))
        new_e.append(s * np.asarray(e, np.float64))
    return new_e, new_o, new_p


def obb_corners(extent, orientation, position) -> np.ndarray:
    """[8, 3] world corners of one OBB."""
    signs = np.array(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sz in (-0.5, 0.5)], np.float64)
    local = signs * np.asarray(extent, np.float64)
    return local @ np.asarray(orientation, np.float64).T + np.asarray(
        position, np.float64)


def scene_room_bbox(extents, orientations, positions):
    """AABB hull over all transformed object OBB corners (ref
    save_transforms_with_boxes.py:43-60). Returns (min, max) or None."""
    if not len(extents):
        return None
    corners = np.concatenate([
        obb_corners(e, o, p)
        for e, o, p in zip(extents, orientations, positions)
    ])
    return corners.min(axis=0), corners.max(axis=0)


def ngp_scale_offset(room_bbox):
    """instant-ngp scale/offset that places the room into the unit cube
    around 0.5 (ref save_transforms_with_all_boxes.py:449-456)."""
    lo, hi = np.asarray(room_bbox[0]), np.asarray(room_bbox[1])
    scale = 1.5 / float(np.max(hi - lo))
    offset = np.array([0.5, 0.5, 0.5]) - scale * (lo + hi) / 2.0
    return scale, offset


def load_boxes_json(path: str, swap_yz: bool = False):
    """Box-annotation json -> (extents, orientations, positions,
    class_names). Accepts the HM3D per-room AABB list
    ([{class_name, bbox: [min_pt, max_pt]}] — ref get_boxes :84-116, with
    the raw capture's y-up -> z-up swap behind swap_yz) and the OBB-dict
    format ({bounding_boxes: [{extents, orientation, position, label?}]})."""
    with open(path) as f:
        data = json.load(f)
    extents, orients, positions, names = [], [], [], []
    items = data["bounding_boxes"] if isinstance(data, dict) else data
    for obj in items:
        if "bbox" in obj:  # AABB [min_pt, max_pt]
            lo = np.asarray(obj["bbox"][0], np.float64)
            hi = np.asarray(obj["bbox"][1], np.float64)
            if swap_yz:
                lo = lo[[0, 2, 1]]
                hi = hi[[0, 2, 1]]
            extents.append(hi - lo)
            orients.append(np.eye(3))
            positions.append((lo + hi) / 2.0)
        else:
            extents.append(np.asarray(obj["extents"], np.float64))
            orients.append(np.asarray(obj["orientation"], np.float64))
            positions.append(np.asarray(obj["position"], np.float64))
        names.append(obj.get("class_name", obj.get("label")))
    return extents, orients, positions, names


def load_category_mapping(tsv_path: str):
    """category-name -> NYU40 id from a Matterport-style mapping tsv
    (columns 'category' and 'nyu40id'; ref
    save_transforms_with_boxes.py:37-39). Returns {} if no path."""
    if not tsv_path:
        return {}
    import csv

    mapping = {}
    with open(tsv_path) as f:
        # the reference file is 4-space separated; accept tab or 4-space
        sample = f.read()
    delim = "\t" if "\t" in sample.splitlines()[0] else None
    rows = (
        csv.DictReader(sample.splitlines(), delimiter=delim)
        if delim else None
    )
    if rows is None:
        lines = sample.splitlines()
        header = lines[0].split("    ")
        idx_cat = header.index("category")
        idx_nyu = header.index("nyu40id")
        for line in lines[1:]:
            parts = line.split("    ")
            if len(parts) > max(idx_cat, idx_nyu):
                try:
                    mapping[parts[idx_cat].strip().lower()] = int(
                        float(parts[idx_nyu]))
                except ValueError:
                    continue
        return mapping
    for row in rows:
        try:
            mapping[row["category"].strip().lower()] = int(
                float(row["nyu40id"]))
        except (KeyError, ValueError):
            continue
    return mapping


def filter_boxes(extents, orients, positions, names, mapping,
                 filter_by_label: bool, min_extent: float = 0.0):
    """Label + size filtering (ref get_filtered_boxes :129-212: map raw
    class names through the category tsv to NYU40, drop the excluded
    architectural/clutter labels, drop boxes with any extent below
    min_extent — size thresholds here are in WORLD units; the reference's
    voxel-unit thresholding happens downstream in preprocess_boxes.py)."""
    keep_e, keep_o, keep_p, keep_n = [], [], [], []
    for e, o, p, n in zip(extents, orients, positions, names):
        if filter_by_label and n is not None:
            name = str(n).strip().lower()
            if name == "sofa":  # ref :152-154 remaps sofa -> couch
                name = "couch"
            nyu_id = mapping.get(name, 40)
            label = NYU40_ID_TO_LABEL.get(int(nyu_id), "otherprop")
            if label in EXCLUDED_NYU40_LABELS:
                continue
        if min_extent > 0 and (np.asarray(e) < min_extent).any():
            continue
        keep_e.append(e)
        keep_o.append(o)
        keep_p.append(p)
        keep_n.append(n)
    return keep_e, keep_o, keep_p, keep_n


def build_transforms(
    poses: np.ndarray,            # [N, 4, 4] or [N, 3, 4] raw c2w
    frame_paths,                  # N relative image paths
    boxes=None,                   # (extents, orientations, positions)
    width: int = 512,
    height: int = 512,
    fov_x_deg: float = 90.0,
    aabb_scale: float = 2.0,
) -> dict:
    """Assemble the instant-ngp transforms dict: PCA-normalize poses, carry
    boxes through the same transform, derive room_bbox + ngp scale/offset
    (ref save_transforms_with_all_boxes.py:345-472)."""
    focal = (width / 2.0) / np.tan(np.deg2rad(fov_x_deg) / 2.0)
    camera_angle_x = 2.0 * np.arctan(width / (2.0 * focal))
    poses_rec, transform = transform_poses_pca(np.asarray(poses))
    poses_h = np.tile(np.eye(4), (len(poses_rec), 1, 1))
    poses_h[:, :3, :4] = poses_rec

    out = {
        "camera_angle_x": float(camera_angle_x),
        "fl_x": float(focal), "fl_y": float(focal),
        "k1": 0, "k2": 0, "p1": 0, "p2": 0,
        "scale": 1.0, "aabb_scale": float(aabb_scale),
        "cx": float(width / 2), "cy": float(height / 2),
        "w": float(width), "h": float(height),
        "frames": [
            {"file_path": fp, "transform_matrix": pose.tolist()}
            for fp, pose in zip(frame_paths, poses_h)
        ],
    }

    if boxes is not None and len(boxes[0]):
        ext_t, ori_t, pos_t = transform_obbs(*boxes, transform)
        lo, hi = scene_room_bbox(ext_t, ori_t, pos_t)
        scale, offset = ngp_scale_offset((lo, hi))
        out["room_bbox"] = [lo.tolist(), hi.tolist()]
        out["scale"] = float(scale)
        out["offset"] = offset.tolist()
        out["bounding_boxes"] = [
            {"extents": e.tolist(), "orientation": o.tolist(),
             "position": p.tolist()}
            for e, o, p in zip(ext_t, ori_t, pos_t)
        ]
    else:
        out["room_bbox"] = [[-1, -1, -1], [1, 1, 1]]
    out["pca_transform"] = transform.tolist()  # for round-trip validation
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Raw pose/box captures -> instant-ngp transforms.json "
                    "with PCA-normalized poses and aligned world boxes")
    p.add_argument("--input_dir", required=True,
                   help="scene folder: poses/*.json ({'pose': 4x4 c2w}) + "
                        "images/*.png (matched by stem)")
    p.add_argument("--boxes_json", default=None,
                   help="box annotations (HM3D [{class_name, bbox}] or "
                        "{bounding_boxes: [{extents, orientation, "
                        "position}]})")
    p.add_argument("--output", default=None,
                   help="output transforms.json (default "
                        "<input_dir>/train/transforms.json)")
    p.add_argument("--width", default=512, type=int)
    p.add_argument("--height", default=512, type=int)
    p.add_argument("--fov_x", default=90.0, type=float)
    p.add_argument("--swap_yz", action="store_true",
                   help="raw AABBs are y-up; swap to z-up (HM3D captures)")
    p.add_argument("--filter_by_label", action="store_true")
    p.add_argument("--category_mapping", default="",
                   help="Matterport-style category->nyu40id tsv")
    p.add_argument("--min_extent", default=0.0, type=float,
                   help="drop boxes with any world extent below this")
    args = p.parse_args(argv)

    pose_files = sorted(
        glob.glob(os.path.join(args.input_dir, "poses", "*.json")))
    if not pose_files:
        pose_files = sorted(glob.glob(os.path.join(args.input_dir, "*.json")))
        pose_files = [f for f in pose_files
                      if os.path.basename(f) != "transforms.json"]
    if not pose_files:
        print(f"no pose jsons under {args.input_dir}", file=sys.stderr)
        return 1

    poses, frame_paths = [], []
    for pf in pose_files:
        with open(pf) as f:
            poses.append(np.asarray(json.load(f)["pose"], np.float64))
        stem = os.path.splitext(os.path.basename(pf))[0]
        frame_paths.append(os.path.join("images", stem + ".png"))

    boxes = None
    if args.boxes_json:
        e, o, pos, names = load_boxes_json(args.boxes_json, args.swap_yz)
        mapping = load_category_mapping(args.category_mapping)
        e, o, pos, names = filter_boxes(
            e, o, pos, names, mapping, args.filter_by_label, args.min_extent)
        boxes = (e, o, pos)

    out = build_transforms(
        np.stack(poses), frame_paths, boxes,
        width=args.width, height=args.height, fov_x_deg=args.fov_x)

    out_path = args.output or os.path.join(
        args.input_dir, "train", "transforms.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    n_boxes = len(out.get("bounding_boxes", []))
    print(f"wrote {out_path}: {len(frame_paths)} frames, {n_boxes} boxes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
