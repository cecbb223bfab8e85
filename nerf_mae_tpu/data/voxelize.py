"""Semantic voxelization: depth maps -> point clouds -> majority-label voxel
grids.

Capability match for the reference's voxelize pipeline
(reference: nerf_rpn/scripts/voxelize/voxelize.py:47-80 majority-vote
voxelize; front3d_depth2pc.py depth back-projection), vectorized numpy
(np.add.at scatter instead of per-point loops).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def depth_to_pointcloud(
    depth: np.ndarray,  # [H, W] metric depth
    intrinsics: np.ndarray,  # [3, 3]
    c2w: np.ndarray,  # [4, 4] camera-to-world (OpenCV convention: +z forward)
    labels: np.ndarray = None,  # [H, W] optional per-pixel labels
    max_depth: float = np.inf,
) -> Tuple[np.ndarray, np.ndarray]:
    """Back-project a depth map to world-space points
    (reference: voxelize/front3d_depth2pc.py). Returns (points [N, 3],
    labels [N] or None)."""
    h, w = depth.shape
    i, j = np.meshgrid(np.arange(w), np.arange(h))
    valid = (depth > 0) & (depth < max_depth)
    z = depth[valid]
    x = (i[valid] - intrinsics[0, 2]) * z / intrinsics[0, 0]
    y = (j[valid] - intrinsics[1, 2]) * z / intrinsics[1, 1]
    cam = np.stack([x, y, z, np.ones_like(z)], axis=1)
    world = cam @ c2w.T
    pts = world[:, :3]
    if labels is not None:
        return pts, labels[valid]
    return pts, None


def voxelize_labels(
    points: np.ndarray,  # [N, 3]
    labels: np.ndarray,  # [N] int, 0 = void
    bbox_min: Sequence[float],
    bbox_max: Sequence[float],
    resolution: Sequence[int],  # (W, L, H)
) -> np.ndarray:
    """Majority-vote semantic voxel grid [W, L, H] int32
    (reference: voxelize/voxelize.py:47-80)."""
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    res = np.asarray(resolution, np.int64)
    n_classes = int(labels.max()) + 1 if labels.size else 1

    idx = np.empty((points.shape[0], 3), np.int64)
    for a in range(3):
        idx[:, a] = np.clip(
            (points[:, a] - bbox_min[a]) / (bbox_max[a] - bbox_min[a]) * res[a],
            0, res[a] - 1,
        )
    counts = np.zeros((*res, n_classes), np.int32)
    np.add.at(counts, (idx[:, 0], idx[:, 1], idx[:, 2], labels.astype(np.int64)), 1)
    return np.argmax(counts, axis=-1).astype(np.int32)


def boxes_from_instance_labels(
    voxel_instances: np.ndarray,  # [W, L, H] int instance ids (0 = void)
    min_voxels: int = 8,
) -> np.ndarray:
    """Tight AABBs [N, 6] around each instance id in a voxel grid — the box
    annotation path used when instance voxels are available
    (reference capability: data/*/preprocess boxes from annotations)."""
    boxes = []
    for inst in np.unique(voxel_instances):
        if inst == 0:
            continue
        idx = np.argwhere(voxel_instances == inst)
        if idx.shape[0] < min_voxels:
            continue
        boxes.append([*idx.min(0), *(idx.max(0) + 1)])
    return np.asarray(boxes, np.float32).reshape(-1, 6)
