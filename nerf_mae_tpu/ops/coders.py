"""Box delta coders for the anchor-based RPN.

Capability match for the reference's coder package:
  * AABB delta coder (torchvision-style center/log-size deltas,
    reference: nerf_rpn/model/coder/AABB_coder.py:7-140)
  * midpoint-offset coder: 8 deltas between an AABB anchor and an OBB gt
    (reference: coder/midpoint_offset_coder.py:106-223)
All functions are elementwise over [..., N, dims] — no per-image loops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from nerf_mae_tpu.ops.obb import obb2hbb, obb2poly, rectpoly2obb

BBOX_XFORM_CLIP = math.log(2000.0)


def encode_aabb_deltas(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """gt [..., 6], anchors [..., 6] -> deltas [..., 6]."""
    aw = anchors[..., 3:6] - anchors[..., 0:3]
    ac = anchors[..., 0:3] + 0.5 * aw
    gw = gt[..., 3:6] - gt[..., 0:3]
    gc = gt[..., 0:3] + 0.5 * gw
    d_ctr = (gc - ac) / aw
    d_size = jnp.log(gw / aw)
    return jnp.concatenate([d_ctr, d_size], axis=-1)


def decode_aabb_deltas(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """deltas [..., 6], anchors [..., 6] -> boxes [..., 6]."""
    aw = anchors[..., 3:6] - anchors[..., 0:3]
    ac = anchors[..., 0:3] + 0.5 * aw
    ctr = deltas[..., 0:3] * aw + ac
    size = jnp.exp(jnp.clip(deltas[..., 3:6], None, BBOX_XFORM_CLIP)) * aw
    return jnp.concatenate([ctr - size / 2, ctr + size / 2], axis=-1)


def encode_rotated_deltas(gt7: jnp.ndarray, rois7: jnp.ndarray) -> jnp.ndarray:
    """OBB-to-OBB 7-delta encoding in the roi's rotated frame
    (reference: coder/rotated_coder.py:13-48)."""
    coord = gt7[..., 0:3] - rois7[..., 0:3]
    cos, sin = jnp.cos(rois7[..., 6]), jnp.sin(rois7[..., 6])
    dx = (cos * coord[..., 0] + sin * coord[..., 1]) / rois7[..., 3]
    dy = (-sin * coord[..., 0] + cos * coord[..., 1]) / rois7[..., 4]
    dz = coord[..., 2] / rois7[..., 5]
    dsize = jnp.log(gt7[..., 3:6] / rois7[..., 3:6])
    dtheta = (gt7[..., 6] - rois7[..., 6]) / (2 * jnp.pi)
    return jnp.concatenate(
        [jnp.stack([dx, dy, dz], -1), dsize, dtheta[..., None]], axis=-1
    )


def decode_rotated_deltas(deltas: jnp.ndarray, rois7: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_rotated_deltas
    (reference: coder/rotated_coder.py:50-122)."""
    cos, sin = jnp.cos(rois7[..., 6]), jnp.sin(rois7[..., 6])
    dx = deltas[..., 0] * rois7[..., 3]
    dy = deltas[..., 1] * rois7[..., 4]
    ctr_x = dx * cos - dy * sin + rois7[..., 0]
    ctr_y = dx * sin + dy * cos + rois7[..., 1]
    ctr_z = deltas[..., 2] * rois7[..., 5] + rois7[..., 2]
    size = rois7[..., 3:6] * jnp.exp(
        jnp.clip(deltas[..., 3:6], None, BBOX_XFORM_CLIP)
    )
    theta = deltas[..., 6] * 2 * jnp.pi + rois7[..., 6]
    # canonicalize into (-pi/2, pi/2] like the reference
    # (rotated_coder.py:108-110): theta % pi, then fold (pi/2, pi) down
    theta = theta % jnp.pi
    theta = jnp.where(theta > jnp.pi / 2, theta - jnp.pi, theta)
    return jnp.concatenate(
        [jnp.stack([ctr_x, ctr_y, ctr_z], -1), size, theta[..., None]], axis=-1
    )


def encode_midpoint_offset(gt7: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """OBB gt [..., 7] vs AABB anchors [..., 6] -> 8 deltas
    (dx dy dz dw dh dd da db) (reference: midpoint_offset_coder.py:106-158)."""
    aw = anchors[..., 3:6] - anchors[..., 0:3]
    ac = anchors[..., 0:3] + 0.5 * aw

    gt2d = gt7[..., jnp.array([0, 1, 3, 4, 6])]
    hbb = obb2hbb(gt2d)  # [..., 4]
    poly = obb2poly(gt2d)  # [..., 8]
    gx = (hbb[..., 0] + hbb[..., 2]) * 0.5
    gy = (hbb[..., 1] + hbb[..., 3]) * 0.5
    gw = hbb[..., 2] - hbb[..., 0]
    gh = hbb[..., 3] - hbb[..., 1]
    gz = gt7[..., 2]
    gd = gt7[..., 5]

    xs, ys = poly[..., 0::2], poly[..., 1::2]
    y_min = ys.min(-1, keepdims=True)
    x_max = xs.max(-1, keepdims=True)
    ga = jnp.where(jnp.abs(ys - y_min) > 0.1, -1000.0, xs).max(-1)
    gb = jnp.where(jnp.abs(xs - x_max) > 0.1, -1000.0, ys).max(-1)

    dx = (gx - ac[..., 0]) / aw[..., 0]
    dy = (gy - ac[..., 1]) / aw[..., 1]
    dz = (gz - ac[..., 2]) / aw[..., 2]
    dw = jnp.log(gw / aw[..., 0])
    dh = jnp.log(gh / aw[..., 1])
    dd = jnp.log(gd / aw[..., 2])
    da = (ga - gx) / gw
    db = (gb - gy) / gh
    return jnp.stack([dx, dy, dz, dw, dh, dd, da, db], axis=-1)


def decode_midpoint_offset(
    deltas: jnp.ndarray, anchors: jnp.ndarray, wh_ratio_clip: float = 16 / 1000
) -> jnp.ndarray:
    """8 deltas + AABB anchors -> OBB [..., 7] with polygon
    rectangularization (reference: midpoint_offset_coder.py:160-223)."""
    max_ratio = abs(math.log(wh_ratio_clip))
    aw = anchors[..., 3:6] - anchors[..., 0:3]
    ac = anchors[..., 0:3] + 0.5 * aw

    d_size = jnp.clip(deltas[..., 3:6], -max_ratio, max_ratio)
    gw = aw[..., 0] * jnp.exp(d_size[..., 0])
    gh = aw[..., 1] * jnp.exp(d_size[..., 1])
    gd = aw[..., 2] * jnp.exp(d_size[..., 2])
    gx = ac[..., 0] + aw[..., 0] * deltas[..., 0]
    gy = ac[..., 1] + aw[..., 1] * deltas[..., 1]
    gz = ac[..., 2] + aw[..., 2] * deltas[..., 2]

    x1, y1 = gx - gw / 2, gy - gh / 2
    x2, y2 = gx + gw / 2, gy + gh / 2
    da = jnp.clip(deltas[..., 6], -0.5, 0.5)
    db = jnp.clip(deltas[..., 7], -0.5, 0.5)
    ga, _ga = gx + da * gw, gx - da * gw
    gb, _gb = gy + db * gh, gy - db * gh
    polys = jnp.stack([ga, y1, x2, gb, _ga, y2, x1, _gb], axis=-1)

    # rectangularize: scale each vertex to the max diagonal length
    center = jnp.stack([gx, gy] * 4, axis=-1)
    cp = polys - center
    diag = jnp.sqrt(cp[..., 0::2] ** 2 + cp[..., 1::2] ** 2 + 1e-12)
    scale = diag.max(-1, keepdims=True) / jnp.maximum(diag, 1e-7)
    cp = cp * jnp.repeat(scale, 2, axis=-1)
    obb2d = rectpoly2obb(cp + center)  # [..., 5]
    return jnp.concatenate(
        [obb2d[..., 0:2], gz[..., None], obb2d[..., 2:4], gd[..., None],
         obb2d[..., 4:5]],
        axis=-1,
    )
