"""FCOS-style 3D detection head, loss, and post-processing — TPU-native.

Capability match for the reference FCOS stack (reference: nerf_rpn/model/
fcos/fcos.py:26-474, fcos/loss.py:174-591, fcos/inference.py:11-195):
shared cls/bbox towers (4x conv+GN32+relu) applied per FPN level with a
per-level learned Scale, focal-loss classification, (rotated-)IoU box
regression weighted by centerness, centerness BCE — plus a static-shape
post-processor (masked top-k + decode + NMS) instead of the reference's
python loops.

Static-shape conventions: GT boxes are padded [B, G, 6|7] + gt_valid; scene
extents are `sizes [B, 3]`; detector outputs are fixed-size [B, K, ...] with
a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_mae_tpu.ops.boxes import clip_boxes_to_grid, small_box_mask
from nerf_mae_tpu.ops.fcos_box import decode_fcos_aabb, decode_fcos_obb
from nerf_mae_tpu.ops.fcos_targets import (
    assign_fcos_targets,
    centerness_targets,
    level_locations,
)
from nerf_mae_tpu.ops.nms import nms_mask
from nerf_mae_tpu.ops.rotated_iou import diou_3d_loss, giou_3d_loss, iou_3d


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    resolution: int = 160
    strides: Sequence[int] = (4, 8, 16, 32)
    num_convs: int = 4
    use_obb: bool = False
    norm_reg_targets: bool = True
    centerness_on_reg: bool = True
    center_sampling_radius: float = 1.5
    iou_loss_type: str = "iou"  # iou | linear_iou | giou | diou | smooth_l1
    use_additional_l1_loss: bool = False
    reg_loss_weight: float = 1.0  # (reference: run_fcos_pretrained.py:154)
    proj2d_loss_weight: float = 0.0  # OBB-only aux loss (fcos/loss.py:579)
    # post-processing (reference: run_fcos_pretrained.py:273-292)
    pre_nms_thresh: float = 0.0
    pre_nms_top_n: int = 2500
    nms_thresh: float = 0.3
    post_nms_top_n: int = 2500
    min_size: float = 0.0
    max_gt: int = 64  # padded GT capacity per scene
    # Exact-parity switch: the reference starts the reg head at zero bias
    # (relu(norm_reg_targets) ~ 0, ref fcos/fcos.py:121-135). Our default
    # starts distance channels at 0.5 to escape the zero-volume IoU
    # plateau (see _reg_bias_init). Set True to reproduce reference init
    # for architecture-parity validation runs (PARITY.md).
    reference_init: bool = False

    @property
    def reg_dim(self) -> int:
        return 8 if self.use_obb else 6


class FCOSHead(nn.Module):
    """Weight-shared towers over the FPN levels
    (reference: fcos/fcos.py:26-139). Returns per-level (logits [B, *S, 1],
    bbox [B, *S, 6|8], centerness [B, *S, 1])."""

    cfg: FCOSConfig
    in_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], training: bool = False):
        cfg = self.cfg
        conv_init = nn.initializers.normal(0.01)
        cls_tower, box_tower = [], []
        for i in range(cfg.num_convs):
            cls_tower.append(
                (
                    nn.Conv(self.in_channels, (3, 3, 3), padding="SAME",
                            dtype=self.dtype, kernel_init=conv_init,
                            name=f"cls_tower{i}"),
                    nn.GroupNorm(num_groups=32, name=f"cls_gn{i}"),
                )
            )
            box_tower.append(
                (
                    nn.Conv(self.in_channels, (3, 3, 3), padding="SAME",
                            dtype=self.dtype, kernel_init=conv_init,
                            name=f"box_tower{i}"),
                    nn.GroupNorm(num_groups=32, name=f"box_gn{i}"),
                )
            )
        prior = 0.01
        cls_logits = nn.Conv(
            1, (3, 3, 3), padding="SAME", dtype=self.dtype, kernel_init=conv_init,
            bias_init=nn.initializers.constant(-np.log((1 - prior) / prior)),
            name="cls_logits",
        )
        def _reg_bias_init(key, shape, dtype=jnp.float32):
            # Distance channels start at 0.5 (half a stride in normalized
            # units) so initial boxes are ~unit cubes with real overlap.
            # The reference's relu(norm_reg_targets) head starts at
            # relu(~0) = 0 where the +1-smoothed IoU loss has a flat spot
            # (d inter/d pred is a product of two ~zero extents while the
            # union term pushes volume further down) — a degenerate
            # attractor that froze reg at -log(1/2) in low-data runs.
            # Standard FCOS avoids it via exp(0) = 1; this matches that
            # operating point. OBB midpoint channels (6:) stay 0.
            # cfg.reference_init=True keeps the reference's zero bias
            # (ref fcos/fcos.py:121-135) for exact-parity runs.
            del key
            b = jnp.zeros(shape, dtype)
            if cfg.reference_init:
                return b
            return b.at[:6].set(0.5)

        bbox_pred = nn.Conv(
            cfg.reg_dim, (3, 3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=conv_init, bias_init=_reg_bias_init,
            name="bbox_pred",
        )
        centerness = nn.Conv(
            1, (3, 3, 3), padding="SAME", dtype=self.dtype, kernel_init=conv_init,
            name="centerness",
        )
        scales = self.param(
            "scales", nn.initializers.ones, (len(cfg.strides),)
        )

        logits, bbox_reg, ctr = [], [], []
        for lvl, feat in enumerate(features):
            c = feat
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            b = feat
            for conv, gn in box_tower:
                b = nn.relu(gn(conv(b)))
            logits.append(cls_logits(c).astype(jnp.float32))
            ctr.append(
                centerness(b if cfg.centerness_on_reg else c).astype(jnp.float32)
            )
            reg = bbox_pred(b).astype(jnp.float32) * scales[lvl]
            # distances through relu; OBB midpoint offsets stay raw
            # (reference: fcos/fcos.py:121-135); at eval the caller
            # multiplies by stride (norm_reg_targets)
            reg = jnp.concatenate(
                [nn.relu(reg[..., :6]), reg[..., 6:]], axis=-1
            )
            bbox_reg.append(reg)
        return logits, bbox_reg, ctr


def _flatten_levels(xs: List[jnp.ndarray], last_dim: int) -> jnp.ndarray:
    """[ [B, W, L, H, C] per level ] -> [B, sum(WLH), C]."""
    return jnp.concatenate(
        [x.reshape(x.shape[0], -1, last_dim) for x in xs], axis=1
    )


def sigmoid_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (torchvision semantics, used by the
    reference at fcos/loss.py:182,538)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def fcos_loss(
    cfg: FCOSConfig,
    logits: List[jnp.ndarray],
    bbox_reg: List[jnp.ndarray],
    ctr: List[jnp.ndarray],
    gt_boxes: jnp.ndarray,  # [B, G, 6|7]
    gt_valid: jnp.ndarray,  # [B, G]
    sizes: jnp.ndarray,  # [B, 3]
):
    """Returns (total, {loss_cls, loss_reg, loss_centerness, num_pos}).

    Equivalent to FCOSLossComputation (reference: fcos/loss.py:477-591);
    the DDP reduce_sum normalizations are implicit because batch-global sums
    over a sharded batch ARE the cross-chip reductions under jit.
    """
    per_level, locs_np, strides_np, ranges_np = level_locations(
        (cfg.resolution,) * 3, tuple(cfg.strides)
    )
    locations = jnp.asarray(locs_np)
    strides = jnp.asarray(strides_np)
    size_ranges = jnp.asarray(ranges_np)

    labels, reg_targets = assign_fcos_targets(
        locations, strides, size_ranges, gt_boxes, gt_valid,
        cfg.center_sampling_radius, cfg.use_obb,
    )  # [B, L], [B, L, 6|8] (voxel units)
    if cfg.norm_reg_targets:
        reg_targets = reg_targets.at[..., :6].set(
            reg_targets[..., :6] / strides[None, :, None]
        )

    cls_flat = _flatten_levels(logits, 1)[..., 0]  # [B, L]
    reg_flat = _flatten_levels(bbox_reg, cfg.reg_dim)  # [B, L, 6|8]
    ctr_flat = _flatten_levels(ctr, 1)[..., 0]  # [B, L]

    # padding mask: location center inside the un-padded extent
    # (reference: fcos/fcos.py:301-320)
    pad_valid = jnp.all(locations[None] < sizes[:, None, :], axis=-1)  # [B, L]

    pos = labels * pad_valid  # [B, L] in {0, 1}
    num_pos = pos.sum()
    num_pos_norm = jnp.maximum(num_pos, 1.0)

    cls_loss = (
        sigmoid_focal_loss(cls_flat, labels) * pad_valid
    ).sum() / num_pos_norm

    ctr_targets = centerness_targets(reg_targets)  # [B, L]
    sum_ctr = jnp.maximum((ctr_targets * pos).sum(), 1e-6)

    if cfg.iou_loss_type == "smooth_l1":
        per_loc = _smooth_l1(reg_flat, reg_targets).sum(-1)
        reg_loss = (per_loc * ctr_targets * pos).sum() / sum_ctr
    elif cfg.use_obb:
        dummy = jnp.zeros(reg_flat.shape[:-1] + (3,))
        # sanitize non-positive locations BEFORE decoding: zero offsets make
        # degenerate boxes whose norm/polygon gradients are NaN, and a
        # downstream where() does not stop NaN backprop (0 * NaN = NaN)
        posm = pos[..., None] > 0
        safe = jnp.array([1, 1, 1, 1, 1, 1, 0.2, 0.2], jnp.float32)
        pred_boxes = decode_fcos_obb(dummy, jnp.where(posm, reg_flat, safe))
        tgt_boxes = decode_fcos_obb(dummy, jnp.where(posm, reg_targets, safe))
        if cfg.iou_loss_type == "giou":
            per_loc = giou_3d_loss(pred_boxes, tgt_boxes)
        elif cfg.iou_loss_type == "diou":
            per_loc = diou_3d_loss(pred_boxes, tgt_boxes)
        else:
            iou, union = iou_3d(pred_boxes, tgt_boxes, return_union=True)
            smooth = (iou * union + 1.0) / (union + 1.0)
            per_loc = (
                -jnp.log(jnp.maximum(smooth, 1e-7))
                if cfg.iou_loss_type == "iou"
                else 1.0 - smooth
            )
        reg_loss = (per_loc * ctr_targets * pos).sum() / sum_ctr
        if cfg.use_additional_l1_loss:
            l1 = _smooth_l1(reg_flat[..., 6:], reg_targets[..., 6:]).sum(-1)
            reg_loss = reg_loss + (l1 * ctr_targets * pos).sum() / sum_ctr
    else:
        per_loc = _aabb_iou_loss(reg_flat, reg_targets, cfg.iou_loss_type)
        reg_loss = (per_loc * ctr_targets * pos).sum() / sum_ctr

    ctr_loss = (
        optax_sigmoid_ce(ctr_flat, ctr_targets) * pos
    ).sum() / num_pos_norm

    if cfg.use_obb and cfg.proj2d_loss_weight > 0:
        from nerf_mae_tpu.ops.projection import projection_2d_loss

        # reference: centerness-weighted pixel smooth-L1 / (4 views x 2
        # points x 2 coords), then / centerness sum (fcos/loss.py:473-475,
        # :581-585)
        loss_2d = projection_2d_loss(
            pred_boxes, tgt_boxes, ctr_targets * pos, cfg.resolution
        ) / 16.0 / sum_ctr
        reg_loss = reg_loss + cfg.proj2d_loss_weight * loss_2d

    total = cls_loss + cfg.reg_loss_weight * reg_loss + ctr_loss
    return total, {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
        "num_pos": num_pos,
    }


def _smooth_l1(pred, target, beta: float = 1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _aabb_iou_loss(pred, target, loss_type: str):
    """Offset-space AABB IoU/GIoU loss (reference: fcos/loss.py:77-132).
    pred/target [..., 6] non-negative distances."""
    pl, pt, pf, pr, pb, pk = (pred[..., i] for i in range(6))
    tl, tt, tf, tr, tb, tk = (target[..., i] for i in range(6))
    tv = (tl + tr) * (tt + tb) * (tf + tk)
    pv = (pl + pr) * (pt + pb) * (pf + pk)
    wi = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    gwi = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    hi = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    ghi = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    di = jnp.minimum(pf, tf) + jnp.minimum(pk, tk)
    gdi = jnp.maximum(pf, tf) + jnp.maximum(pk, tk)
    ac = gwi * ghi * gdi + 1e-7
    inter = wi * hi * di
    union = tv + pv - inter
    ious = (inter + 1.0) / (union + 1.0)
    if loss_type == "iou":
        return -jnp.log(jnp.maximum(ious, 1e-7))
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        return 1.0 - (ious - (ac - union) / ac)
    raise ValueError(loss_type)


def fcos_objectness(logits: List[jnp.ndarray], ctr: List[jnp.ndarray]):
    """Per-level per-voxel objectness grids sqrt(sigmoid(cls)*sigmoid(ctr))
    (reference: fcos/fcos.py:322-337 output_objectness)."""
    return [
        jnp.sqrt(jnp.clip(
            jax.nn.sigmoid(l[..., 0].astype(jnp.float32))
            * jax.nn.sigmoid(c[..., 0].astype(jnp.float32)), 0.0,
        ))
        for l, c in zip(logits, ctr)
    ]


def fcos_postprocess(
    cfg: FCOSConfig,
    logits: List[jnp.ndarray],
    bbox_reg: List[jnp.ndarray],
    ctr: List[jnp.ndarray],
    sizes: jnp.ndarray,  # [B, 3]
):
    """Static-shape detection decoding (reference: fcos/inference.py:11-195).

    Per level: sigmoid scores masked by padding, top-k (pre_nms_top_n spread
    proportionally across levels), decode at locations; then joint NMS and
    final top-k. Returns dict with boxes [B, K, 7] (OBB form; AABBs are
    converted via aabb_to_obb-style centering), scores [B, K],
    level [B, K], valid [B, K].
    """
    per_level, locs_np, strides_np, _ = level_locations(
        (cfg.resolution,) * 3, tuple(cfg.strides)
    )
    b = logits[0].shape[0]

    boxes_all, scores_all, level_all, valid_all = [], [], [], []
    offset = 0
    for lvl in range(len(logits)):
        locs = jnp.asarray(per_level[lvl])  # [Li, 3]
        n_i = locs.shape[0]
        cls = jax.nn.sigmoid(
            logits[lvl].reshape(b, -1).astype(jnp.float32)
        )  # [B, Li]
        ctr_s = jax.nn.sigmoid(ctr[lvl].reshape(b, -1).astype(jnp.float32))
        reg = bbox_reg[lvl].reshape(b, n_i, cfg.reg_dim).astype(jnp.float32)
        if cfg.norm_reg_targets:
            reg = reg.at[..., :6].set(reg[..., :6] * cfg.strides[lvl])

        pad_valid = jnp.all(locs[None] < sizes[:, None, :], axis=-1)  # [B, Li]
        cand = (cls > cfg.pre_nms_thresh) & pad_valid
        score = jnp.sqrt(jnp.clip(cls * ctr_s, 0.0))  # combined score

        k = min(cfg.pre_nms_top_n, n_i)
        masked = jnp.where(cand, score, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(masked, k)  # [B, k]
        top_locs = locs[top_idx]  # [B, k, 3]
        top_reg = jnp.take_along_axis(reg, top_idx[..., None], axis=1)

        if cfg.use_obb:
            det = decode_fcos_obb(top_locs, top_reg)  # [B, k, 7]
        else:
            aabb = decode_fcos_aabb(top_locs, top_reg)  # [B, k, 6]
            aabb = jax.vmap(clip_boxes_to_grid)(aabb, sizes.astype(aabb.dtype))
            c = (aabb[..., :3] + aabb[..., 3:6]) / 2
            s = aabb[..., 3:6] - aabb[..., :3]
            det = jnp.concatenate([c, s, jnp.zeros_like(c[..., :1])], axis=-1)

        ok = jnp.isfinite(top_scores)
        if cfg.min_size > 0:
            ok = ok & jax.vmap(lambda d: small_box_mask(d, cfg.min_size))(det)
        boxes_all.append(det)
        scores_all.append(jnp.where(ok, top_scores, 0.0))
        level_all.append(jnp.full((b, k), lvl, jnp.int32))
        valid_all.append(ok)
        offset += n_i

    boxes = jnp.concatenate(boxes_all, axis=1)  # [B, N, 7]
    scores = jnp.concatenate(scores_all, axis=1)
    levels = jnp.concatenate(level_all, axis=1)
    valid = jnp.concatenate(valid_all, axis=1)

    # NMS on AABB IoU for AABB mode / rotated IoU for OBB, per scene
    def per_scene(bx, sc, vd):
        if cfg.use_obb:
            keep = nms_mask(bx, sc, cfg.nms_thresh, valid=vd,
                            max_keep=cfg.post_nms_top_n)
        else:
            aabb = jnp.concatenate(
                [bx[:, :3] - bx[:, 3:6] / 2, bx[:, :3] + bx[:, 3:6] / 2], axis=-1
            )
            keep = nms_mask(aabb, sc, cfg.nms_thresh, valid=vd,
                            max_keep=cfg.post_nms_top_n)
        return keep

    keep = jax.vmap(per_scene)(boxes, scores, valid)

    k_out = min(cfg.post_nms_top_n, boxes.shape[1])
    final_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(final_scores, k_out)
    gather = lambda x: jnp.take_along_axis(
        x, top_idx.reshape(b, k_out, *([1] * (x.ndim - 2))), axis=1
    )
    return {
        "boxes": gather(boxes),
        "scores": jnp.where(jnp.isfinite(top_scores), top_scores, 0.0),
        "levels": gather(levels[..., None])[..., 0],
        "valid": jnp.isfinite(top_scores),
    }
