"""Differentiable rotated-box IoU (z-axis rotation), pure JAX.

Capability match for the reference's rotated_iou stack — including its CUDA
`sort_vertices` kernel (reference: nerf_rpn/model/rotated_iou/
oriented_iou_loss.py, box_intersection_2d.py, cuda_op/sort_vert_kernel.cu) —
re-designed branch-free for TPU:

  * the 2D intersection polygon of two rectangles has <= 8 vertices drawn
    from 24 candidates (8 corners-in-other-box + 16 edge-pair intersections)
  * instead of a custom CUDA vertex sort, candidates are angle-sorted around
    the valid-vertex centroid with `jnp.argsort` (invalid candidates pushed
    to +inf) and the shoelace area is computed with a wrap trick that routes
    gradients only through valid vertices
  * everything is elementwise over an arbitrary leading batch shape, so the
    same code serves loss (per-location) and pairwise-IoU (N x M) uses

Boxes are [..., 7] = (x, y, z, w, l, h, theta).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def _enclosing_candidate_tables():
    """Static (24, 2) line and (24, 6) rest-point index tables for the
    smallest enclosing box: every pair of the 8 corners except the 4 box
    diagonals is a candidate hull edge
    (reference: nerf_rpn/model/rotated_iou/min_enclosing_box.py:25-50)."""
    skip = {(0, 2), (1, 3), (5, 7), (4, 6)}
    lines, points = [], []
    for i in range(8):
        for j in range(i + 1, 8):
            if (i, j) in skip:
                continue
            lines.append([i, j])
            points.append([k for k in range(8) if k not in (i, j)])
    return np.array(lines, np.int32), np.array(points, np.int32)


_ENC_LINES, _ENC_POINTS = _enclosing_candidate_tables()


def box2corners(box5: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (x, y, w, h, alpha) -> [..., 4, 2] corners, CCW order
    (same convention as reference oriented_iou_loss.py:6-35)."""
    x, y, w, h, a = (box5[..., i] for i in range(5))
    dx = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    dy = jnp.stack([h / 2, h / 2, -h / 2, -h / 2], axis=-1)
    cos, sin = jnp.cos(a)[..., None], jnp.sin(a)[..., None]
    cx = dx * cos - dy * sin + x[..., None]
    cy = dx * sin + dy * cos + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _edge_intersections(c1: jnp.ndarray, c2: jnp.ndarray):
    """All 16 edge-pair intersection candidates.

    c1, c2: [..., 4, 2] -> (points [..., 16, 2], valid [..., 16]).
    Segment-segment intersection with the strict-interior convention
    (collinear edges yield no intersection), like reference
    box_intersection_2d.py:11-52.
    """
    # edges: (p, q) pairs
    p1 = c1
    q1 = jnp.roll(c1, -1, axis=-2)
    p2 = c2
    q2 = jnp.roll(c2, -1, axis=-2)
    # pair every edge of box1 with every edge of box2: [..., 4, 4, 2]
    x1, y1 = p1[..., :, None, 0], p1[..., :, None, 1]
    x2, y2 = q1[..., :, None, 0], q1[..., :, None, 1]
    x3, y3 = p2[..., None, :, 0], p2[..., None, :, 1]
    x4, y4 = q2[..., None, :, 0], q2[..., None, :, 1]
    num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
    den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
    t = den_t / jnp.where(num == 0.0, 1.0, num)
    u = -den_u / jnp.where(num == 0.0, 1.0, num)
    valid = (num != 0.0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    t_safe = den_t / (num + _EPS)
    px = x1 + t_safe * (x2 - x1)
    py = y1 + t_safe * (y2 - y1)
    pts = jnp.stack([px, py], axis=-1) * valid[..., None]
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _corners_in_box(pts: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """pts [..., 4, 2] inside rectangle given by its corners box [..., 4, 2]
    (projection test, reference box_intersection_2d.py:54-79)."""
    a = box[..., 0:1, :]
    ab = box[..., 1:2, :] - a
    ad = box[..., 3:4, :] - a
    am = pts - a
    p_ab = jnp.sum(ab * am, axis=-1)
    n_ab = jnp.sum(ab * ab, axis=-1)
    p_ad = jnp.sum(ad * am, axis=-1)
    n_ad = jnp.sum(ad * ad, axis=-1)
    c1 = (p_ab / n_ab > -1e-6) & (p_ab / n_ab < 1 + 1e-6)
    c2 = (p_ad / n_ad > -1e-6) & (p_ad / n_ad < 1 + 1e-6)
    return c1 & c2


def rect_intersection_area_2d(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two rectangles given corners [..., 4, 2]."""
    inter_pts, inter_valid = _edge_intersections(c1, c2)
    in12 = _corners_in_box(c1, c2)
    in21 = _corners_in_box(c2, c1)
    verts = jnp.concatenate([c1, c2, inter_pts], axis=-2)  # [..., 24, 2]
    valid = jnp.concatenate([in12, in21, inter_valid], axis=-1)  # [..., 24]

    n_valid = jnp.sum(valid, axis=-1, keepdims=True)  # [..., 1]
    vf = valid[..., None].astype(verts.dtype)
    mean = jnp.sum(verts * vf, axis=-2, keepdims=True) / jnp.maximum(
        n_valid[..., None], 1
    )
    centered = verts - mean
    ang = jnp.arctan2(centered[..., 1], centered[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid last
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(centered, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)
    # replace invalid tail with the first (valid) vertex so the closing
    # wrap edges contribute zero area; keeps everything branch-free
    first = sorted_pts[..., 0:1, :]
    poly = jnp.where(sorted_valid[..., None], sorted_pts, first)
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    area = jnp.abs(jnp.sum(cross, axis=-1)) / 2
    return jnp.where(n_valid[..., 0] > 2, area, 0.0)


def iou_3d(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, return_union: bool = False
):
    """Elementwise rotated 3D IoU over matching leading shapes
    (reference: oriented_iou_loss.py:82-107 cal_iou_3d)."""
    c1 = box2corners(boxes1[..., jnp.array([0, 1, 3, 4, 6])])
    c2 = box2corners(boxes2[..., jnp.array([0, 1, 3, 4, 6])])
    inter_2d = rect_intersection_area_2d(c1, c2)
    zmax = jnp.minimum(
        boxes1[..., 2] + boxes1[..., 5] / 2, boxes2[..., 2] + boxes2[..., 5] / 2
    )
    zmin = jnp.maximum(
        boxes1[..., 2] - boxes1[..., 5] / 2, boxes2[..., 2] - boxes2[..., 5] / 2
    )
    z_overlap = jnp.clip(zmax - zmin, 0.0)
    inter = inter_2d * z_overlap
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    union = v1 + v2 - inter
    iou = inter / jnp.maximum(union, _EPS)
    if return_union:
        return iou, union
    return iou


def box_iou_obb_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] x [M, 7] -> [N, M] rotated IoU matrix."""
    b1 = jnp.broadcast_to(
        boxes1[:, None, :], (boxes1.shape[0], boxes2.shape[0], 7)
    )
    b2 = jnp.broadcast_to(
        boxes2[None, :, :], (boxes1.shape[0], boxes2.shape[0], 7)
    )
    return iou_3d(b1, b2)


def _enclosing_aabb_2d(c1: jnp.ndarray, c2: jnp.ndarray):
    pts = jnp.concatenate([c1, c2], axis=-2)
    w = pts[..., 0].max(axis=-1) - pts[..., 0].min(axis=-1)
    h = pts[..., 1].max(axis=-1) - pts[..., 1].min(axis=-1)
    return w, h


def smallest_enclosing_box_2d(c1: jnp.ndarray, c2: jnp.ndarray):
    """(width, length) of the minimum-area rotated rectangle enclosing the
    8 corners of two boxes [..., 4, 2] each.

    A minimum-area enclosing box has one side collinear with a hull edge, so
    brute-force over the 24 candidate corner pairs (all pairs minus the 4
    box diagonals), measuring the point spread perpendicular and parallel to
    each candidate line and taking the min-area candidate — same algorithm
    (including the degenerate-line guards) as the reference
    (reference: nerf_rpn/model/rotated_iou/min_enclosing_box.py:83-193).
    Differentiable: gradients flow through the selected candidate only.
    """
    corners = jnp.concatenate([c1, c2], axis=-2)  # [..., 8, 2]
    lines = corners[..., _ENC_LINES, :]  # [..., 24, 2, 2]
    points = corners[..., _ENC_POINTS, :]  # [..., 24, 6, 2]
    x1, y1 = lines[..., 0:1, 0], lines[..., 0:1, 1]  # [..., 24, 1]
    x2, y2 = lines[..., 1:2, 0], lines[..., 1:2, 1]

    # spread perpendicular to the line: signed point-line distances
    px, py = points[..., 0], points[..., 1]  # [..., 24, 6]
    den = (y2 - y1) * px - (x2 - x1) * py + x2 * y1 - y2 * x1
    num = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2 + 1e-14)
    d = den / num
    d1 = d.max(axis=-1) - d.min(axis=-1)  # points on both sides
    d2 = jnp.abs(d).max(axis=-1)  # all points on one side
    dist = jnp.maximum(d1, d2)  # [..., 24]

    # spread parallel to the line: project all 8 points onto its direction
    k = (y2 - y1) / (x2 - x1 + _EPS)  # [..., 24, 1]
    vec = jnp.concatenate([jnp.ones_like(k), k], axis=-1)[..., None, :]
    pts8 = jnp.concatenate([lines, points], axis=-2)  # [..., 24, 8, 2]
    proj = jnp.sum(pts8 * vec, axis=-1) / jnp.linalg.norm(
        vec, axis=-1
    )  # [..., 24, 8]
    spread = proj.max(axis=-1) - proj.min(axis=-1)  # [..., 24]

    area = spread * dist
    # degenerate candidate lines (coincident endpoints) give zero area —
    # push them out of the argmin (reference: min_enclosing_box.py:155-158)
    area = area + (area == 0.0).astype(area.dtype) * 1e8
    idx = jax.lax.stop_gradient(jnp.argmin(area, axis=-1))[..., None]
    w = jnp.take_along_axis(spread, idx, axis=-1)[..., 0]
    h = jnp.take_along_axis(dist, idx, axis=-1)[..., 0]
    return w, h


def _enclosing_wh(c1, c2, enclosing_type: str):
    if enclosing_type == "smallest":
        return smallest_enclosing_box_2d(c1, c2)
    if enclosing_type == "aligned":
        return _enclosing_aabb_2d(c1, c2)
    raise ValueError(f"unknown enclosing_type {enclosing_type!r}")


def giou_3d_loss(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    enclosing_type: str = "smallest",
) -> jnp.ndarray:
    """GIoU loss for rotated 3D boxes: enclosing volume is the 2D enclosing
    box of the footprints ("smallest" rotated — the reference default — or
    "aligned" AABB) x the z-extent union
    (reference: oriented_iou_loss.py:109-127 cal_giou_3d)."""
    iou, union = iou_3d(boxes1, boxes2, return_union=True)
    c1 = box2corners(boxes1[..., jnp.array([0, 1, 3, 4, 6])])
    c2 = box2corners(boxes2[..., jnp.array([0, 1, 3, 4, 6])])
    w, h = _enclosing_wh(c1, c2, enclosing_type)
    zmax = jnp.maximum(
        boxes1[..., 2] + boxes1[..., 5] / 2, boxes2[..., 2] + boxes2[..., 5] / 2
    )
    zmin = jnp.minimum(
        boxes1[..., 2] - boxes1[..., 5] / 2, boxes2[..., 2] - boxes2[..., 5] / 2
    )
    vol_c = jnp.maximum(w * h * (zmax - zmin), _EPS)
    giou = iou - (vol_c - union) / vol_c
    return 1.0 - giou


def diou_3d_loss(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    enclosing_type: str = "smallest",
) -> jnp.ndarray:
    """DIoU loss: 1 - iou + center-distance^2 / enclosing-diagonal^2
    (reference: oriented_iou_loss.py:128-147 cal_diou_3d)."""
    iou, _ = iou_3d(boxes1, boxes2, return_union=True)
    c1 = box2corners(boxes1[..., jnp.array([0, 1, 3, 4, 6])])
    c2 = box2corners(boxes2[..., jnp.array([0, 1, 3, 4, 6])])
    w, h = _enclosing_wh(c1, c2, enclosing_type)
    zmax = jnp.maximum(
        boxes1[..., 2] + boxes1[..., 5] / 2, boxes2[..., 2] + boxes2[..., 5] / 2
    )
    zmin = jnp.minimum(
        boxes1[..., 2] - boxes1[..., 5] / 2, boxes2[..., 2] - boxes2[..., 5] / 2
    )
    c2_diag = w * w + h * h + (zmax - zmin) ** 2
    d2 = jnp.sum((boxes1[..., :3] - boxes2[..., :3]) ** 2, axis=-1)
    return 1.0 - iou + d2 / jnp.maximum(c2_diag, _EPS)
