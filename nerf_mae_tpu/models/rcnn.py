"""RCNN second stage: ROI sampling + aligned pooling + cls/reg head.

Capability match for the reference's detector.py
(reference: nerf_rpn/model/detector.py:12-641 — ProposalTargetLayer, ROIPool,
RCNN, Classification_Model) with static shapes: proposals come padded
[B, R, 7] + validity; sampling picks a fixed rois_per_scene subset with the
rank-vs-threshold trick; pooling is ops.roi_align (the CUDA kernel's
TPU-native replacement).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_mae_tpu.ops.boxes import box_iou_aabb
from nerf_mae_tpu.ops.coders import (
    decode_aabb_deltas,
    decode_rotated_deltas,
    encode_aabb_deltas,
    encode_rotated_deltas,
)
from nerf_mae_tpu.ops.obb import obb2hbb_3d
from nerf_mae_tpu.ops.roi_align import fpn_level_for_boxes, roi_align_rotated_3d


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    resolution: int = 160
    strides: Sequence[int] = (4, 8, 16, 32)
    rois_per_scene: int = 128
    fg_fraction: float = 0.5
    fg_threshold: float = 0.5
    bg_threshold: float = 0.2
    output_size: int = 5
    enlarge_scale: float = 0.2
    num_classes: int = 2
    rotated: bool = False
    conv_depth: int = 2

    @property
    def reg_dim(self) -> int:
        return 7 if self.rotated else 6


def sample_rois(
    rng: jax.Array,
    cfg: RCNNConfig,
    proposals: jnp.ndarray,  # [R, 6] AABB or [R, 7] OBB (native form)
    prop_valid: jnp.ndarray,  # [R]
    gt_boxes: jnp.ndarray,  # [G, 6|7]
    gt_valid: jnp.ndarray,  # [G]
):
    """Per-scene FG/BG ROI sampling (reference: detector.py:60-168).
    Returns (sel_idx [K], labels [K], matched_gt [K, 6|7], sel_valid [K])
    with K = rois_per_scene."""
    if cfg.rotated:
        prop_aabb = obb2hbb_3d(proposals)
        gt_aabb = obb2hbb_3d(gt_boxes)
    else:
        prop_aabb = proposals
        gt_aabb = gt_boxes
    iou = box_iou_aabb(prop_aabb, gt_aabb)  # [R, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = iou.max(axis=1)
    assign = jnp.argmax(iou, axis=1)

    fg = (max_iou >= cfg.fg_threshold) & prop_valid
    bg = (max_iou < cfg.bg_threshold) & prop_valid

    k = min(cfg.rois_per_scene, proposals.shape[0])
    n_fg_cap = int(round(cfg.fg_fraction * k))
    r = jax.random.uniform(rng, (proposals.shape[0],))

    def ranks(mask):
        order = jnp.argsort(jnp.where(mask, r, jnp.inf))
        out = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        return out

    n_fg = jnp.minimum(fg.sum(), n_fg_cap)
    n_bg = jnp.minimum(bg.sum(), k - n_fg)
    take_fg = fg & (ranks(fg) < n_fg)
    take_bg = bg & (ranks(bg) < n_bg)
    take = take_fg | take_bg
    # stable selection of up to k taken rois (padded with invalid slots)
    priority = jnp.where(take_fg, 2.0, jnp.where(take_bg, 1.0, 0.0)) + r * 1e-3
    _, sel = jax.lax.top_k(priority, k)
    labels = take_fg[sel].astype(jnp.int32)  # binary RPN classification
    sel_valid = take[sel]
    matched = gt_boxes[assign[sel]]
    return sel, labels, matched, sel_valid


class RCNNHead(nn.Module):
    """Conv (optional) + flatten + linear cls/reg
    (reference: detector.py:441-494)."""

    cfg: RCNNConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):  # [N, S, S, S, C]
        x = pooled.astype(self.dtype)
        for i in range(self.cfg.conv_depth):
            x = nn.relu(
                nn.Conv(x.shape[-1], (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            )
        x = x.reshape(x.shape[0], -1)
        deltas = nn.Dense(self.cfg.reg_dim, name="bbox_pred")(x)
        scores = nn.Dense(self.cfg.num_classes, name="cls_score")(x)
        return deltas.astype(jnp.float32), scores.astype(jnp.float32)


class RCNNStage(nn.Module):
    """Second-stage classification/refinement over padded proposals
    (reference: detector.py:499-627 Classification_Model).

    Train: sample rois, pool features, CE over classes + smooth-L1 on
    positive deltas. Eval: score + refine all valid proposals.
    """

    cfg: RCNNConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.head = RCNNHead(self.cfg, dtype=self.dtype)

    def _pool(self, feats_scene, rois):
        if rois.shape[-1] == 6:  # AABB -> center/size/theta-0 form
            c = (rois[..., :3] + rois[..., 3:6]) / 2
            s = rois[..., 3:6] - rois[..., :3]
            rois7 = jnp.concatenate([c, s, jnp.zeros_like(c[..., :1])], axis=-1)
        else:
            rois7 = rois
        levels = fpn_level_for_boxes(
            rois7, k_max=len(self.cfg.strides) - 1,
            canonical_scale=self.cfg.resolution,
        )
        return roi_align_rotated_3d(
            feats_scene, rois7, levels, tuple(self.cfg.strides),
            self.cfg.output_size, self.cfg.enlarge_scale,
        )

    def __call__(
        self,
        features: List[jnp.ndarray],  # per-level [B, W, L, H, C]
        proposals: jnp.ndarray,  # [B, R, 6|7] native form
        prop_valid: jnp.ndarray,  # [B, R]
        gt_boxes: Optional[jnp.ndarray] = None,  # [B, G, 6|7]
        gt_valid: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        training: bool = False,
    ):
        cfg = self.cfg
        b = proposals.shape[0]

        if training:
            rngs = jax.random.split(rng, b)
            sel, labels, matched, sel_valid = jax.vmap(
                lambda k, p, pv, g, gv: sample_rois(k, cfg, p, pv, g, gv)
            )(rngs, proposals, prop_valid, gt_boxes, gt_valid)
            rois = jnp.take_along_axis(proposals, sel[..., None], axis=1)
        else:
            rois = proposals
            labels = matched = None
            sel_valid = prop_valid

        pooled = jax.vmap(
            lambda *args: self._pool(list(args[:-1]), args[-1])
        )(*features, rois)  # [B, K, S, S, S, C]
        k = pooled.shape[1]
        deltas, scores = self.head(pooled.reshape((b * k,) + pooled.shape[2:]))
        deltas = deltas.reshape(b, k, cfg.reg_dim)
        scores = scores.reshape(b, k, cfg.num_classes)

        if not training:
            if cfg.rotated:
                refined = decode_rotated_deltas(deltas, rois)
            else:
                refined = decode_aabb_deltas(deltas, rois)
            probs = jax.nn.softmax(scores, axis=-1)
            return {
                "boxes": refined,
                "scores": probs[..., 1:].max(-1),
                "valid": sel_valid,
            }

        # sanitize before encoding: degenerate rois/targets produce NaNs in
        # log-size deltas that survive multiplication by a zero mask
        roi_size = (
            rois[..., 3:6] if cfg.rotated else rois[..., 3:6] - rois[..., 0:3]
        )
        gt_size = (
            matched[..., 3:6] if cfg.rotated
            else matched[..., 3:6] - matched[..., 0:3]
        )
        ok = (
            sel_valid
            & jnp.all(roi_size > 1e-3, axis=-1)
            & jnp.all(gt_size > 1e-3, axis=-1)
        )
        safe_obb = jnp.array([0, 0, 0, 1, 1, 1, 0], jnp.float32)
        safe_aabb = jnp.array([0, 0, 0, 1, 1, 1], jnp.float32)
        safe_roi = safe_obb if cfg.rotated else safe_aabb
        safe_gt = safe_obb if cfg.rotated else safe_aabb
        rois_s = jnp.where(ok[..., None], rois, safe_roi)
        matched_s = jnp.where(ok[..., None], matched, safe_gt)
        if cfg.rotated:
            reg_targets = encode_rotated_deltas(matched_s, rois_s)
        else:
            reg_targets = encode_aabb_deltas(matched_s, rois_s)
        sel_valid = ok

        valid_f = sel_valid.astype(jnp.float32)
        logp = jax.nn.log_softmax(scores, axis=-1)
        cls_nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        cls_loss = (cls_nll * valid_f).sum() / jnp.maximum(valid_f.sum(), 1.0)

        pos = (labels > 0).astype(jnp.float32) * valid_f
        d = jnp.abs(deltas - reg_targets)
        beta = 1.0 / 9.0
        sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)
        reg_loss = (sl1 * pos).sum() / jnp.maximum(pos.sum(), 1.0)

        total = cls_loss + reg_loss
        return total, {
            "loss_cls": cls_loss,
            "loss_reg": reg_loss,
            "num_pos": pos.sum(),
        }
