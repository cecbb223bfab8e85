"""Visualization / export utilities (headless).

Capability match for the reference's open3d-based viewers and export
scripts (reference: nerf_mae/model/mae/viz_utils.py:66 draw_grid_colors,
nerf_mae/model/mae/test_mask*.py masking visualizers, nerf_rpn/scripts/
proposals2ngp.py). This environment has no display/open3d, so everything
exports to standard files: ASCII PLY point clouds, npz grids, instant-ngp
box json.
"""

from __future__ import annotations

import json
from copy import deepcopy
from typing import Dict, Optional

import numpy as np


def grid_to_pointcloud(
    rgbsigma: np.ndarray, alpha_thresh: float = 0.01
) -> Dict[str, np.ndarray]:
    """(W, L, H, 4) channel-last grid -> {points [N, 3], colors [N, 3]} of
    occupied voxels (the reference's draw_grid_colors input contract)."""
    alpha = rgbsigma[..., 3]
    idx = np.argwhere(alpha > alpha_thresh)
    colors = rgbsigma[idx[:, 0], idx[:, 1], idx[:, 2], :3]
    return {"points": idx.astype(np.float32), "colors": np.clip(colors, 0, 1)}


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """ASCII PLY writer (no external deps)."""
    n = points.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        cols = (
            (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            if colors is not None
            else None
        )
        for i in range(n):
            row = f"{points[i, 0]:.3f} {points[i, 1]:.3f} {points[i, 2]:.3f}"
            if cols is not None:
                row += f" {cols[i, 0]} {cols[i, 1]} {cols[i, 2]}"
            f.write(row + "\n")


def save_masked_recon(
    path_prefix: str,
    target: np.ndarray,  # (W, L, H, 4)
    pred: np.ndarray,  # (W, L, H, 4) raw model output
    token_mask: np.ndarray,  # (T, T, T) bool
    patch: int = 4,
):
    """Masking-visualizer export (reference: test_mask_new.py flow): writes
    <prefix>_target.ply, <prefix>_masked.ply (masked patches removed),
    <prefix>_pred.ply."""
    mask_vox = np.repeat(np.repeat(np.repeat(token_mask, patch, 0), patch, 1), patch, 2)
    masked = target.copy()
    masked[mask_vox] = 0.0

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    pred_vis = pred.copy()
    pred_vis[..., 3] = sigmoid(pred[..., 3])
    for name, grid in (("target", target), ("masked", masked), ("pred", pred_vis)):
        pc = grid_to_pointcloud(grid)
        save_ply(f"{path_prefix}_{name}.ply", pc["points"], pc["colors"])


def ngp_matrix_to_nerf(matrix, scale, offset, from_mitsuba):
    """(reference: scripts/proposals2ngp.py:10-20)"""
    result = deepcopy(matrix)
    if from_mitsuba:
        result[:, [0, 2]] *= -1
    else:
        result = result[[2, 0, 1], :]
    result[:, [1, 2]] *= -1
    result[:, 3] = (result[:, 3] - offset) / scale
    return result


def proposals_to_ngp_boxes(proposals: np.ndarray, meta: Dict) -> list:
    """AABB proposals [N, 6] (voxel coords) -> instant-ngp box dicts using
    the scene npz metadata {resolution, bbox_min, bbox_max, scale, offset,
    from_mitsuba} (reference: scripts/proposals2ngp.py:23-59)."""
    grid_res = meta["resolution"]
    bbox_min = np.asarray(meta["bbox_min"], np.float64)
    bbox_max = np.asarray(meta["bbox_max"], np.float64)
    scale = meta["scale"]
    offset = np.asarray(meta["offset"], np.float64)
    from_mitsuba = bool(meta.get("from_mitsuba", False))

    perm = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float64)
    diag = bbox_max - bbox_min
    box_min = proposals[:, :3] / grid_res * diag + bbox_min
    box_max = proposals[:, 3:6] / grid_res * diag + bbox_min
    offset_yup = perm @ offset

    boxes = []
    for i in range(box_min.shape[0]):
        center = (box_min[i] + box_max[i]) * 0.5
        extent = (box_max[i] - box_min[i]) / scale
        xform = np.concatenate([np.eye(3), center[:, None]], axis=1)
        xform = perm @ xform
        xform = ngp_matrix_to_nerf(xform, scale, offset_yup, from_mitsuba)
        boxes.append(
            {
                "orientation": xform[:3, :3].tolist(),
                "position": xform[:3, 3].tolist(),
                "extents": extent.tolist(),
            }
        )
    return boxes


def save_ngp_boxes(path: str, proposals: np.ndarray, meta: Dict):
    with open(path, "w") as f:
        json.dump({"bounding_boxes": proposals_to_ngp_boxes(proposals, meta)}, f,
                  indent=2)
