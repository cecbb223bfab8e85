"""Rotated 3D ROI align + FPN level mapping, pure JAX.

Capability match for the reference's CUDA ROIAlignRotated3D extension and
its pure-torch fallback (reference: nerf_rpn/model/rotated_align/cuda_3d/
ROIAlignRotated3D_cuda.cu:14-235; model/detector.py:170-438 ROIPool) and
the FPN LevelMapper (reference: model/level_mapper.py:21-80).

TPU re-design: a fixed S^3 sampling lattice in the (optionally rotated) box
frame, trilinear-gathered from each FPN level, then combined with a one-hot
level mask — one batched gather instead of per-roi python loops, fully
jittable and differentiable (gather gradients are scatter-adds XLA handles
natively).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def fpn_level_for_boxes(
    boxes: jnp.ndarray,  # [..., >=6] OBB (w,l,h at 3:6) or AABB
    k_min: int = 0,
    k_max: int = 3,
    canonical_scale: int = 160,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper Eqn.(1) level assignment by cube-root volume
    (reference: level_mapper.py:46-58). Returns int32 in [k_min, k_max]-k_min."""
    if boxes.shape[-1] == 7:
        vol = boxes[..., 3] * boxes[..., 4] * boxes[..., 5]
    else:
        whd = boxes[..., 3:6] - boxes[..., 0:3]
        vol = whd[..., 0] * whd[..., 1] * whd[..., 2]
    s = jnp.cbrt(jnp.maximum(vol, 1e-9))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    return (jnp.clip(lvl, k_min, k_max) - k_min).astype(jnp.int32)


def _trilinear_sample(feat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """feat [W, L, H, C], pts [N, 3] fractional voxel coords -> [N, C].
    Out-of-range samples contribute zero (matches the CUDA kernel's empty
    handling at ROIAlignRotated3D_cuda.cu:14-40)."""
    w, l, h, _ = feat.shape
    inside = (
        (pts[:, 0] >= -1) & (pts[:, 0] <= w)
        & (pts[:, 1] >= -1) & (pts[:, 1] <= l)
        & (pts[:, 2] >= -1) & (pts[:, 2] <= h)
    )
    p = jnp.clip(pts, 0.0, jnp.asarray([w - 1, l - 1, h - 1], pts.dtype))
    f = jnp.floor(p)
    d = p - f
    f = f.astype(jnp.int32)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = jnp.clip(f[:, 0] + dx, 0, w - 1)
                cy = jnp.clip(f[:, 1] + dy, 0, l - 1)
                cz = jnp.clip(f[:, 2] + dz, 0, h - 1)
                wgt = (
                    (d[:, 0] if dx else 1 - d[:, 0])
                    * (d[:, 1] if dy else 1 - d[:, 1])
                    * (d[:, 2] if dz else 1 - d[:, 2])
                )
                out = out + feat[cx, cy, cz, :] * wgt[:, None]
    return out * inside[:, None]


def roi_align_rotated_3d(
    features: List[jnp.ndarray],  # per-level [W_l, L_l, H_l, C] (one scene)
    rois: jnp.ndarray,  # [R, 7] (x, y, z, w, l, h, theta) in voxel coords
    roi_levels: jnp.ndarray,  # [R] int32 in [0, n_levels)
    strides: Sequence[int],
    output_size: int = 5,
    enlarge_scale: float = 0.2,
) -> jnp.ndarray:
    """[R, S, S, S, C] aligned features for one scene.

    Each ROI gets an S^3 lattice of sample points spanning its (enlarged)
    extent in the box frame, rotated by theta about z and translated to the
    box center; points are trilinear-sampled from the ROI's FPN level.
    """
    s = output_size
    r = rois.shape[0]
    size = rois[:, 3:6] * (1.0 + enlarge_scale)  # [R, 3]
    # lattice in [-0.5, 0.5]^3 (bin centers)
    ax = (jnp.arange(s) + 0.5) / s - 0.5
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    lattice = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)  # [S^3, 3]
    local = lattice[None] * size[:, None, :]  # [R, S^3, 3]
    cos = jnp.cos(rois[:, 6])[:, None]
    sin = jnp.sin(rois[:, 6])[:, None]
    wx = local[..., 0] * cos - local[..., 1] * sin + rois[:, 0:1]
    wy = local[..., 0] * sin + local[..., 1] * cos + rois[:, 1:2]
    wz = local[..., 2] + rois[:, 2:3]
    world = jnp.stack([wx, wy, wz], axis=-1)  # [R, S^3, 3] voxel coords

    out = 0.0
    for lvl, (feat, stride) in enumerate(zip(features, strides)):
        pts = (world / stride).reshape(-1, 3)
        sampled = _trilinear_sample(feat, pts).reshape(r, s**3, -1)
        out = out + sampled * (roi_levels == lvl).astype(sampled.dtype)[:, None, None]
    return out.reshape(r, s, s, s, -1)


def roi_align_3d(
    features: List[jnp.ndarray],
    rois_aabb: jnp.ndarray,  # [R, 6]
    roi_levels: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 5,
    enlarge_scale: float = 0.2,
) -> jnp.ndarray:
    """Axis-aligned variant (the reference's normal_forward maxpool path,
    detector.py:407-438, re-expressed as align sampling)."""
    c = (rois_aabb[:, :3] + rois_aabb[:, 3:6]) / 2
    whd = rois_aabb[:, 3:6] - rois_aabb[:, :3]
    rois7 = jnp.concatenate([c, whd, jnp.zeros_like(c[:, :1])], axis=-1)
    return roi_align_rotated_3d(
        features, rois7, roi_levels, strides, output_size, enlarge_scale
    )
