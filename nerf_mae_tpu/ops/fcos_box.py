"""FCOS box encoding/decoding: AABB distance offsets + OBB midpoint offsets.

Same parameterizations as the reference (reference: nerf_rpn/model/fcos/
utils.py:12-105 decode_fcos_obb/encode_fcos_obb; fcos/inference.py:106-117
AABB decode), vectorized over arbitrary leading dims for jit/vmap.

AABB: 6 non-negative distances (l, t, f, r, b, bk) from a location to the
box faces. OBB adds (alpha, beta) midpoint offsets of the rotated footprint
relative to its 2D AABB.
"""

from __future__ import annotations

import jax.numpy as jnp

from nerf_mae_tpu.ops.rotated_iou import box2corners


def decode_fcos_aabb(locations: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """locations [..., 3] + offsets [..., 6] -> AABB [..., 6]."""
    lo = locations - offsets[..., 0:3]
    hi = locations + offsets[..., 3:6]
    return jnp.concatenate([lo, hi], axis=-1)


def encode_fcos_aabb(locations: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """locations [..., 3] + AABB [..., 6] -> 6 distance offsets."""
    return jnp.concatenate(
        [locations - boxes[..., 0:3], boxes[..., 3:6] - locations], axis=-1
    )


def obb_footprint_aabb(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] OBB -> [..., 6] AABB of its footprint x z-extent
    (reference: fcos/loss.py:337-340)."""
    corners = box2corners(boxes[..., jnp.array([0, 1, 3, 4, 6])])  # [..., 4, 2]
    xmin = corners[..., 0].min(axis=-1)
    xmax = corners[..., 0].max(axis=-1)
    ymin = corners[..., 1].min(axis=-1)
    ymax = corners[..., 1].max(axis=-1)
    zmin = boxes[..., 2] - boxes[..., 5] / 2
    zmax = boxes[..., 2] + boxes[..., 5] / 2
    return jnp.stack([xmin, ymin, zmin, xmax, ymax, zmax], axis=-1)


def encode_fcos_obb(locations: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """locations [..., 3] + OBB [..., 7] -> 8-param midpoint-offset encoding
    (reference: fcos/utils.py:64-105), elementwise over leading dims."""
    corners = box2corners(boxes[..., jnp.array([0, 1, 3, 4, 6])])
    xs, ys = corners[..., 0], corners[..., 1]
    xmax, xmin = xs.max(axis=-1), xs.min(axis=-1)
    ymax, ymin = ys.max(axis=-1), ys.min(axis=-1)

    x0 = locations[..., 0] - xmin
    y0 = locations[..., 1] - ymin
    z0 = locations[..., 2] - (boxes[..., 2] - boxes[..., 5] / 2)
    x1 = xmax - locations[..., 0]
    y1 = ymax - locations[..., 1]
    z1 = (boxes[..., 2] + boxes[..., 5] / 2) - locations[..., 2]

    # midpoints: the corner touching the top edge (max y) and right edge
    # (max x); corner-case handling mirrors the reference
    xt = jnp.where(ymax[..., None] - ys > 0.1, -1e6, xs)
    yt = jnp.where(xmax[..., None] - xs > 0.1, 1e6, ys)
    vx = xt.max(axis=-1)
    vy = yt.min(axis=-1)
    near_aabb = jnp.isclose(vx, xmax) & jnp.isclose(vy, ymin)
    vx = jnp.where(near_aabb, xmax, vx)
    vy = jnp.where(near_aabb, ymin, vy)

    alpha = (vx - boxes[..., 0]) / jnp.maximum(xmax - xmin, 1e-7)
    beta = (vy - boxes[..., 1]) / jnp.maximum(ymax - ymin, 1e-7)
    return jnp.stack([x0, y0, z0, x1, y1, z1, alpha, beta], axis=-1)


def decode_fcos_obb(locations: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """locations [..., 3] + 8-param offsets -> OBB [..., 7]
    (reference: fcos/utils.py:12-61)."""
    x0 = locations[..., 0] - offsets[..., 0]
    y0 = locations[..., 1] - offsets[..., 1]
    z0 = locations[..., 2] - offsets[..., 2]
    x1 = locations[..., 0] + offsets[..., 3]
    y1 = locations[..., 1] + offsets[..., 4]
    z1 = locations[..., 2] + offsets[..., 5]
    vx = (x1 + x0) / 2 + offsets[..., 6] * (x1 - x0)
    vy = (y1 + y0) / 2 + offsets[..., 7] * (y1 - y0)
    vx = jnp.clip(vx, x0, x1)
    vy = jnp.clip(vy, y0, y1)

    cx, cy, cz = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
    v0 = jnp.stack([vx - cx, y1 - cy], axis=-1)  # top-edge midpoint
    v1 = jnp.stack([x1 - cx, vy - cy], axis=-1)  # right-edge midpoint

    # grad-safe norms: sqrt has a NaN gradient at exactly 0, which poisons
    # the backward pass even under jnp.where masking downstream
    def _norm(v):
        return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-12)

    d0 = _norm(v0)
    d1 = _norm(v1)
    dmax = jnp.maximum(d0, d1)
    v0 = v0 / (d0[..., None] + 1e-7) * dmax[..., None]
    v1 = v1 / (d1[..., None] + 1e-7) * dmax[..., None]

    l = _norm(v0 - v1)
    mid = (v0 + v1) / 2
    w = _norm(mid) * 2
    h = z1 - z0
    degenerate = (jnp.abs(mid[..., 0]) < 1e-9) & (jnp.abs(mid[..., 1]) < 1e-9)
    mid_x = jnp.where(degenerate, 1e-7, mid[..., 0])
    mid_y = jnp.where(degenerate, 0.0, mid[..., 1])
    theta = jnp.arctan2(mid_y, mid_x)
    return jnp.stack([cx, cy, cz, w, l, h, theta], axis=-1)
