"""FCOS target assignment, fully vectorized with padded GT boxes.

Reference semantics (reference: nerf_rpn/model/fcos/loss.py:210-445):
per-location regression targets against every GT, center-sampling inside a
stride-scaled region clamped to the (footprint-)AABB, per-level object-size
ranges on the max offset, min-volume tie-break, centerness =
sqrt(prod(min/max per axis-pair)).

TPU re-design: GT boxes come as a padded [B, G, 6|7] array + validity mask
(static shapes); the reference's per-image/per-GT python loops become one
[B, L, G] tensor computation. Level structure is static (location counts per
level are compile-time constants), so level ranges and strides are baked-in
constant vectors of length L.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from nerf_mae_tpu.ops.fcos_box import (
    encode_fcos_aabb,
    encode_fcos_obb,
    obb_footprint_aabb,
)

INF = 1e8

# per-level max-offset ranges (reference: fcos/loss.py:270-275)
OBJECT_SIZES_OF_INTEREST = ((-1.0, 16.0), (16.0, 32.0), (32.0, 64.0), (64.0, INF))


def level_locations(
    grid: Sequence[int], strides: Sequence[int]
) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray, np.ndarray]:
    """Static location geometry for a padded grid.

    Returns (per-level [Li, 3] location arrays, concatenated [L, 3],
    stride per location [L], (lo, hi) size-range per location [L, 2]).
    Locations are voxel centers: stride * idx + stride // 2
    (reference: fcos/fcos.py:282-299).
    """
    per_level = []
    stride_vec = []
    ranges = []
    for lvl, s in enumerate(strides):
        dims = [int(np.ceil(g / s)) for g in grid]
        ax = [np.arange(d, dtype=np.float32) * s + s // 2 for d in dims]
        g0, g1, g2 = np.meshgrid(*ax, indexing="ij")
        locs = np.stack([g0.reshape(-1), g1.reshape(-1), g2.reshape(-1)], axis=1)
        per_level.append(locs)
        stride_vec.append(np.full((locs.shape[0],), s, np.float32))
        lo, hi = OBJECT_SIZES_OF_INTEREST[min(lvl, len(OBJECT_SIZES_OF_INTEREST) - 1)]
        ranges.append(np.tile([[lo, hi]], (locs.shape[0], 1)).astype(np.float32))
    return (
        per_level,
        np.concatenate(per_level, 0),
        np.concatenate(stride_vec, 0),
        np.concatenate(ranges, 0),
    )


def _center_sample_mask(
    aabbs: jnp.ndarray,  # [B, G, 6]
    locations: jnp.ndarray,  # [L, 3]
    strides: jnp.ndarray,  # [L]
    radius: float,
) -> jnp.ndarray:
    """[B, L, G] True where a location falls in the stride-scaled center
    region of the GT, clamped to the GT extent
    (reference: fcos/loss.py:210-267)."""
    center = (aabbs[..., :3] + aabbs[..., 3:6]) / 2  # [B, G, 3]
    r = (strides * radius)[None, :, None, None]  # [1, L, 1, 1]
    c = center[:, None]  # [B, 1, G, 3]
    lo = jnp.maximum(c - r, aabbs[:, None, :, 0:3])
    hi = jnp.minimum(c + r, aabbs[:, None, :, 3:6])
    locs = locations[None, :, None, :]
    inside = jnp.concatenate([locs - lo, hi - locs], axis=-1)  # [B, L, G, 6]
    return inside.min(axis=-1) > 0


def assign_fcos_targets(
    locations: jnp.ndarray,  # [L, 3] (static, all levels concatenated)
    strides: jnp.ndarray,  # [L]
    size_ranges: jnp.ndarray,  # [L, 2]
    gt_boxes: jnp.ndarray,  # [B, G, 6] AABB or [B, G, 7] OBB (padded)
    gt_valid: jnp.ndarray,  # [B, G] bool
    center_sampling_radius: float = 1.5,
    use_obb: bool = False,
):
    """Returns (labels [B, L] in {0, 1}, reg_targets [B, L, 6|8] in voxel
    units — divide by stride for norm_reg_targets, matching the reference's
    per-level normalization at fcos/loss.py:314-316).
    """
    b, g = gt_boxes.shape[:2]
    l = locations.shape[0]

    if use_obb:
        aabbs = obb_footprint_aabb(gt_boxes)  # [B, G, 6]
        locs_e = jnp.broadcast_to(
            locations[None, :, None, :], (b, l, g, 3)
        )
        boxes_e = jnp.broadcast_to(gt_boxes[:, None], (b, l, g, 7))
        reg = encode_fcos_obb(locs_e, boxes_e)  # [B, L, G, 8]
    else:
        aabbs = gt_boxes
        locs_e = locations[None, :, None, :]
        boxes_e = gt_boxes[:, None]
        reg = encode_fcos_aabb(locs_e, jnp.broadcast_to(boxes_e, (b, l, g, 6)))

    if center_sampling_radius > 0:
        is_in = _center_sample_mask(aabbs, locations, strides, center_sampling_radius)
    else:
        is_in = reg[..., :6].min(axis=-1) > 0

    max_off = reg[..., :6].max(axis=-1)  # [B, L, G]
    in_level = (max_off >= size_ranges[None, :, 0:1]) & (
        max_off <= size_ranges[None, :, 1:2]
    )

    whd = aabbs[..., 3:6] - aabbs[..., 0:3]
    volumes = whd[..., 0] * whd[..., 1] * whd[..., 2]  # [B, G]
    cost = jnp.broadcast_to(volumes[:, None], (b, l, g))
    cost = jnp.where(is_in & in_level & gt_valid[:, None, :], cost, INF)

    best = jnp.argmin(cost, axis=-1)  # [B, L]
    best_cost = jnp.take_along_axis(cost, best[..., None], axis=-1)[..., 0]
    labels = (best_cost < INF).astype(jnp.float32)

    reg_targets = jnp.take_along_axis(
        reg, best[..., None, None], axis=2
    )[:, :, 0, :]
    return labels, reg_targets


def centerness_targets(reg: jnp.ndarray) -> jnp.ndarray:
    """sqrt of the product of per-axis min/max offset ratios
    (reference: fcos/loss.py:438-445). reg [..., >=6]."""
    lr = jnp.stack([reg[..., 0], reg[..., 3]], -1)
    tb = jnp.stack([reg[..., 1], reg[..., 4]], -1)
    fb = jnp.stack([reg[..., 2], reg[..., 5]], -1)

    def ratio(p):
        return p.min(-1) / jnp.maximum(p.max(-1), 1e-9)

    return jnp.sqrt(jnp.clip(ratio(lr) * ratio(tb) * ratio(fb), 0.0))
