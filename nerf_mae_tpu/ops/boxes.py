"""Axis-aligned 3D box utilities, vectorized for TPU.

Capability match for the reference's box helpers
(reference: nerf_rpn/model/utils.py:215-400, nerf_rpn/model/fcos/utils.py:
161-290): pairwise AABB IoU, volume, clipping, small-box filtering — all as
pure jittable functions on [N, 6] (x0, y0, z0, x1, y1, z1) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_volume(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 6] -> [N] volumes."""
    whd = boxes[:, 3:6] - boxes[:, 0:3]
    return whd[:, 0] * whd[:, 1] * whd[:, 2]


def box_iou_aabb(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: [N, 6] x [M, 6] -> [N, M]
    (reference: fcos/utils.py:229-298 _box_inter_union_3d)."""
    lt = jnp.maximum(boxes1[:, None, :3], boxes2[None, :, :3])
    rb = jnp.minimum(boxes1[:, None, 3:6], boxes2[None, :, 3:6])
    whd = jnp.clip(rb - lt, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    union = box_volume(boxes1)[:, None] + box_volume(boxes2)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def clip_boxes_to_grid(boxes: jnp.ndarray, size) -> jnp.ndarray:
    """Clamp [.., 6] boxes into [0, size] per axis
    (reference: fcos/utils.py:186-209)."""
    size = jnp.asarray(size, boxes.dtype)
    lo = jnp.clip(boxes[..., 0:3], 0.0, size)
    hi = jnp.clip(boxes[..., 3:6], 0.0, size)
    return jnp.concatenate([lo, hi], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True where ALL sides >= min_size; accepts [N, 6] AABB or [N, 7] OBB
    (reference: fcos/utils.py:161-183)."""
    if boxes.shape[-1] == 6:
        sides = boxes[:, 3:6] - boxes[:, 0:3]
    else:
        sides = boxes[:, 3:6]
    return jnp.all(sides >= min_size, axis=-1)


def aabb_to_obb(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 6] AABB -> [N, 7] (cx, cy, cz, w, l, h, 0)."""
    c = (boxes[:, :3] + boxes[:, 3:6]) / 2
    s = boxes[:, 3:6] - boxes[:, :3]
    return jnp.concatenate([c, s, jnp.zeros_like(boxes[:, :1])], axis=-1)


def obb_to_aabb(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] OBB -> [N, 6] enclosing AABB (z-rotation only)."""
    cx, cy, cz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    w, l, h, theta = boxes[:, 3], boxes[:, 4], boxes[:, 5], boxes[:, 6]
    cos, sin = jnp.abs(jnp.cos(theta)), jnp.abs(jnp.sin(theta))
    ex = (w * cos + l * sin) / 2
    ey = (w * sin + l * cos) / 2
    return jnp.stack(
        [cx - ex, cy - ey, cz - h / 2, cx + ex, cy + ey, cz + h / 2], axis=-1
    )
