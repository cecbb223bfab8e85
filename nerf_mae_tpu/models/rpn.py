"""Anchor-based 3D Region Proposal Network, static shapes.

Capability match for the reference's anchor-RPN path
(reference: nerf_rpn/model/anchor.py:177-213 RPNHead;
model/rpn.py:167-549 RegionProposalNetwork; model/nerf_rpn.py:21-217
NeRFRegionProposalNetwork): conv head over FPN levels emitting per-anchor
objectness + 6 (AABB) or 8 (midpoint-offset OBB) deltas; training matches
anchors to GT by AABB IoU with low-quality restore and a balanced sampler;
eval decodes, per-level top-k, NMS, global top-k.

TPU re-design: anchors are compile-time constants; matching/sampling are
batched tensor ops (vmapped per scene); proposal filtering is the static
top-k + masked-NMS pattern shared with the FCOS post-processor.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_mae_tpu.config import SwinConfig

from nerf_mae_tpu.ops.anchors import (
    DEFAULT_ANCHOR_SIZES,
    DEFAULT_ASPECT_RATIOS,
    anchor_padding_mask,
    balanced_sample,
    grid_anchors,
    match_anchors,
)
from nerf_mae_tpu.ops.boxes import box_iou_aabb, clip_boxes_to_grid
from nerf_mae_tpu.ops.coders import (
    decode_aabb_deltas,
    decode_midpoint_offset,
    encode_aabb_deltas,
    encode_midpoint_offset,
)
from nerf_mae_tpu.ops.nms import nms_mask
from nerf_mae_tpu.ops.obb import obb2hbb_3d
from nerf_mae_tpu.ops.rotated_iou import iou_3d


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    resolution: int = 160
    strides: Sequence[int] = (4, 8, 16, 32)
    anchor_sizes: Sequence[Sequence[float]] = DEFAULT_ANCHOR_SIZES
    aspect_ratios: Sequence[Sequence[float]] = DEFAULT_ASPECT_RATIOS
    normalize_ratios: bool = False
    conv_depth: int = 1
    rotated_bbox: bool = False
    reg_loss_type: str = "smooth_l1"  # smooth_l1 | iou | linear_iou | giou | diou
    fg_iou_thresh: float = 0.35
    bg_iou_thresh: float = 0.2
    batch_size_per_mesh: int = 256
    positive_fraction: float = 0.5
    reg_loss_weight: float = 5.0  # (reference: run_rpn.py:89)
    proj2d_loss_weight: float = 0.0  # (reference: run_rpn.py:91, default 0)
    pre_nms_top_n: int = 2500
    post_nms_top_n: int = 2500
    nms_thresh: float = 0.3
    score_thresh: float = 0.0
    min_size: float = 1e-3
    max_gt: int = 64

    @property
    def delta_dim(self) -> int:
        return 8 if self.rotated_bbox else 6

    @property
    def anchors_per_loc(self) -> int:
        import itertools

        n = 0
        for r in self.aspect_ratios:
            n += len(set(itertools.permutations(r)))
        return n * len(self.anchor_sizes[0])


class RPNHead3D(nn.Module):
    """Shared conv head over FPN levels (reference: anchor.py:177-213)."""

    anchors_per_loc: int
    delta_dim: int
    in_channels: int = 256
    conv_depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        init = nn.initializers.normal(0.01)
        convs = [
            nn.Conv(self.in_channels, (3, 3, 3), padding="SAME",
                    dtype=self.dtype, kernel_init=init, name=f"conv{i}")
            for i in range(self.conv_depth)
        ]
        cls = nn.Conv(self.anchors_per_loc, (1, 1, 1), dtype=self.dtype,
                      kernel_init=init, name="cls_logits")
        bbox = nn.Conv(self.anchors_per_loc * self.delta_dim, (1, 1, 1),
                       dtype=self.dtype, kernel_init=init, name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in convs:
                t = nn.relu(conv(t))
            logits.append(cls(t).astype(jnp.float32))
            deltas.append(bbox(t).astype(jnp.float32))
        return logits, deltas


def _flatten_rpn_outputs(logits, deltas, delta_dim):
    """Per-level [B, W, L, H, A*C] -> [B, sum(WLH*A), C], anchor-major per
    location to match grid_anchors ordering (location-major, then anchor)."""
    b = logits[0].shape[0]
    lg, dl = [], []
    for l, d in zip(logits, deltas):
        lg.append(l.reshape(b, -1))
        dl.append(d.reshape(b, -1, delta_dim))
    return jnp.concatenate(lg, axis=1), jnp.concatenate(dl, axis=1)


def rpn_assign_and_encode(
    cfg: RPNConfig,
    anchors: jnp.ndarray,  # [A, 6]
    anchor_valid: jnp.ndarray,  # [B, A]
    gt_boxes: jnp.ndarray,  # [B, G, 6|7]
    gt_valid: jnp.ndarray,  # [B, G]
):
    """Per-scene matching + target encoding, vmapped.
    Returns (labels [B, A], reg_targets [B, A, delta], matched_boxes
    [B, A, 6|7])."""

    def per_scene(gt, gv, av):
        if cfg.rotated_bbox:
            gt_aabb = obb2hbb_3d(gt)
        else:
            gt_aabb = gt
        quality = box_iou_aabb(gt_aabb, anchors)  # [G, A]
        labels, best_gt = match_anchors(
            quality, gv, av, cfg.bg_iou_thresh, cfg.fg_iou_thresh
        )
        matched = gt[best_gt]  # [A, 6|7]
        if cfg.rotated_bbox:
            reg = encode_midpoint_offset(matched, anchors)
        else:
            reg = encode_aabb_deltas(matched, anchors)
        return labels, reg, matched

    return jax.vmap(per_scene)(gt_boxes, gt_valid, anchor_valid)


def rpn_loss(
    cfg: RPNConfig,
    rng: jax.Array,
    objectness: jnp.ndarray,  # [B, A]
    pred_deltas: jnp.ndarray,  # [B, A, delta]
    anchors: jnp.ndarray,  # [A, 6]
    anchor_valid: jnp.ndarray,  # [B, A]
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
):
    """Objectness BCE over a balanced sample + box regression on positives
    (reference: rpn.py:372-456; smooth-L1 beta 1/9 sum / num_sampled, or
    rotated-IoU on decoded boxes), plus the optional 2D projection loss
    (enabled via proj2d_loss_weight; the reference computes it always but
    weights it 0 by default — run_rpn.py:91)."""
    labels, reg_targets, matched = rpn_assign_and_encode(
        cfg, anchors, anchor_valid, gt_boxes, gt_valid
    )
    b = labels.shape[0]
    rngs = jax.random.split(rng, b)
    pos_mask, neg_mask = jax.vmap(
        lambda k, l: balanced_sample(k, l, cfg.batch_size_per_mesh,
                                     cfg.positive_fraction)
    )(rngs, labels)
    pos = pos_mask.astype(jnp.float32)
    sampled = (pos_mask | neg_mask).astype(jnp.float32)
    n_sampled = jnp.maximum(sampled.sum(), 1.0)

    if cfg.reg_loss_type == "smooth_l1":
        d = jnp.abs(pred_deltas - reg_targets)
        beta = 1.0 / 9.0
        sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)
        reg_loss = (sl1 * pos).sum() / n_sampled
    else:
        if cfg.rotated_bbox:
            decoded = decode_midpoint_offset(pred_deltas, anchors[None])
            safe = jnp.array([0, 0, 0, 1, 1, 1, 0], jnp.float32)
            pm = pos_mask[..., None]
            decoded = jnp.where(pm, decoded, safe)
            tgt = jnp.where(pm, matched, safe)
            iou, union = iou_3d(decoded, tgt, return_union=True)
            smooth = (iou * union + 1.0) / (union + 1.0)
            if cfg.reg_loss_type == "iou":
                per = -jnp.log(jnp.maximum(smooth, 1e-7))
            else:
                per = 1.0 - smooth
            reg_loss = (per * pos).sum() / n_sampled
        else:
            decoded = decode_aabb_deltas(pred_deltas, anchors[None])
            # linear IoU on AABBs
            from nerf_mae_tpu.ops.boxes import box_volume

            lt = jnp.maximum(decoded[..., :3], matched[..., :3])
            rb = jnp.minimum(decoded[..., 3:6], matched[..., 3:6])
            whd = jnp.clip(rb - lt, 0)
            inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
            v1 = jnp.prod(jnp.clip(decoded[..., 3:6] - decoded[..., :3], 0), -1)
            v2 = jnp.prod(matched[..., 3:6] - matched[..., :3], -1)
            iou = (inter + 1.0) / (v1 + v2 - inter + 1.0)
            per = (
                -jnp.log(jnp.maximum(iou, 1e-7))
                if cfg.reg_loss_type == "iou"
                else 1.0 - iou
            )
            reg_loss = (per * pos).sum() / n_sampled

    logp = jnp.maximum(objectness, 0) - objectness * labels + jnp.log1p(
        jnp.exp(-jnp.abs(objectness))
    )
    obj_loss = (logp * sampled).sum() / n_sampled

    aux = {"num_pos": pos.sum(), "num_sampled": sampled.sum()}
    if cfg.proj2d_loss_weight > 0:
        from nerf_mae_tpu.ops.projection import projection_2d_loss

        if cfg.rotated_bbox:
            decoded2 = decode_midpoint_offset(pred_deltas, anchors[None])
            safe = jnp.array([0, 0, 0, 1, 1, 1, 0], jnp.float32)
            decoded2 = jnp.where(pos_mask[..., None], decoded2, safe)
            matched2 = jnp.where(pos_mask[..., None], matched, safe)
        else:
            decoded2 = decode_aabb_deltas(pred_deltas, anchors[None])
            safe = jnp.array([0, 0, 0, 1, 1, 1], jnp.float32)
            decoded2 = jnp.where(pos_mask[..., None], decoded2, safe)
            matched2 = jnp.where(pos_mask[..., None], matched, safe)
        loss_2d = projection_2d_loss(
            decoded2, matched2, pos, cfg.resolution
        ) / jnp.maximum(pos.sum(), 1.0)  # / num sampled pos (ref rpn.py:452)
        aux["loss_reg_2d"] = loss_2d
        reg_loss = reg_loss + cfg.proj2d_loss_weight * loss_2d

    return obj_loss, reg_loss, aux


def rpn_filter_proposals(
    cfg: RPNConfig,
    objectness: jnp.ndarray,  # [B, A]
    pred_deltas: jnp.ndarray,  # [B, A, delta]
    anchors: jnp.ndarray,  # [A, 6]
    level_ids: np.ndarray,  # [A] (static)
    anchor_valid: jnp.ndarray,  # [B, A]
    sizes: jnp.ndarray,  # [B, 3]
):
    """Static-shape proposal filtering (reference: rpn.py:293-371):
    per-level top-k by objectness, decode, clip/min-size, per-level NMS,
    global post-NMS top-k. Returns {boxes, scores, levels, valid}."""
    b = objectness.shape[0]
    scores = jnp.where(anchor_valid, objectness, -jnp.inf)

    picked_boxes, picked_scores, picked_levels, picked_valid = [], [], [], []
    n_levels = int(level_ids.max()) + 1
    for lvl in range(n_levels):
        sel = np.where(level_ids == lvl)[0]
        k = min(cfg.pre_nms_top_n, sel.size)
        s_lvl = scores[:, sel]
        top_s, top_i = jax.lax.top_k(s_lvl, k)  # [B, k]
        a_lvl = anchors[sel]  # [Al, 6]
        top_anchors = a_lvl[top_i]  # [B, k, 6]
        top_deltas = jnp.take_along_axis(
            pred_deltas[:, sel], top_i[..., None], axis=1
        )
        if cfg.rotated_bbox:
            boxes = decode_midpoint_offset(top_deltas, top_anchors)
            ok = jnp.all(boxes[..., 3:6] >= cfg.min_size, axis=-1)
        else:
            boxes = decode_aabb_deltas(top_deltas, top_anchors)
            boxes = jax.vmap(clip_boxes_to_grid)(boxes, sizes.astype(boxes.dtype))
            ok = jnp.all(boxes[..., 3:6] - boxes[..., 0:3] >= cfg.min_size, axis=-1)
        prob = jax.nn.sigmoid(top_s)
        ok = ok & jnp.isfinite(top_s) & (prob >= cfg.score_thresh)
        # per-level NMS (reference uses batched_nms keyed on level)
        keep = jax.vmap(
            lambda bx, sc, vd: nms_mask(bx, sc, cfg.nms_thresh, valid=vd)
        )(boxes, prob, ok)
        picked_boxes.append(boxes)
        picked_scores.append(jnp.where(keep, prob, 0.0))
        picked_levels.append(jnp.full((b, k), lvl, jnp.int32))
        picked_valid.append(keep)

    dim = picked_boxes[0].shape[-1]
    boxes = jnp.concatenate(picked_boxes, axis=1)
    prob = jnp.concatenate(picked_scores, axis=1)
    levels = jnp.concatenate(picked_levels, axis=1)
    valid = jnp.concatenate(picked_valid, axis=1)

    k_out = min(cfg.post_nms_top_n, boxes.shape[1])
    masked = jnp.where(valid, prob, -jnp.inf)
    top_s, top_i = jax.lax.top_k(masked, k_out)
    gather = lambda x: jnp.take_along_axis(
        x, top_i.reshape(b, k_out, *([1] * (x.ndim - 2))), axis=1
    )
    return {
        "boxes": gather(boxes),
        "scores": jnp.where(jnp.isfinite(top_s), top_s, 0.0),
        "levels": gather(levels[..., None])[..., 0],
        "valid": jnp.isfinite(top_s),
    }


class NeRFRPN(nn.Module):
    """Backbone + RPN head, train/eval entry
    (reference: nerf_rpn.py:21-217 NeRFRegionProposalNetwork)."""

    swin: SwinConfig
    rpn: RPNConfig
    backbone: str = "swin_s"
    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True

    def setup(self):
        from nerf_mae_tpu.models.backbones import ResNetFPN, SwinFPN, VGGFPN

        if self.backbone.startswith("swin"):
            self.body = SwinFPN(
                swin=self.swin, out_channels=self.out_channels,
                dtype=self.dtype, remat=self.remat,
            )
        elif self.backbone == "resnet":
            self.body = ResNetFPN(out_channels=self.out_channels, dtype=self.dtype)
        elif self.backbone.startswith("vgg"):
            self.body = VGGFPN(config=self.backbone.split("_")[1],
                               out_channels=self.out_channels, dtype=self.dtype)
        else:
            raise ValueError(self.backbone)
        self.head = RPNHead3D(
            anchors_per_loc=self.rpn.anchors_per_loc,
            delta_dim=self.rpn.delta_dim,
            in_channels=self.out_channels,
            conv_depth=self.rpn.conv_depth,
            dtype=self.dtype,
        )

    def __call__(
        self,
        grids: jnp.ndarray,
        sizes: jnp.ndarray,
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        cfg = self.rpn
        feats = self.body(grids, deterministic)
        logits, deltas = self.head(feats)
        objectness, pred_deltas = _flatten_rpn_outputs(logits, deltas, cfg.delta_dim)

        anchors_np, centers_np, level_ids, _ = grid_anchors(
            cfg.resolution, tuple(cfg.strides),
            tuple(tuple(s) for s in cfg.anchor_sizes),
            tuple(tuple(r) for r in cfg.aspect_ratios),
            cfg.normalize_ratios,
        )
        anchors = jnp.asarray(anchors_np)
        anchor_valid = anchor_padding_mask(jnp.asarray(centers_np), sizes)

        if training:
            obj_loss, reg_loss, aux = rpn_loss(
                cfg, rng, objectness, pred_deltas, anchors, anchor_valid,
                gt_boxes, gt_valid,
            )
            total = obj_loss + cfg.reg_loss_weight * reg_loss
            return total, {"loss_objectness": obj_loss, "loss_reg": reg_loss, **aux}
        return rpn_filter_proposals(
            cfg, objectness, pred_deltas, anchors, level_ids, anchor_valid, sizes
        )
