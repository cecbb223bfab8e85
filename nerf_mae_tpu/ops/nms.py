"""Static-shape NMS for TPU.

The reference's NMS is a Python while-loop over boxes
(reference: nerf_rpn/model/fcos/utils.py:109-158, model/utils.py:215-260) —
the slowest part of its eval path. Here NMS is the classic O(N^2)
matrix formulation: precompute the full IoU matrix once (batched MXU-friendly
arithmetic), then run a fixed-trip-count greedy suppression scan with
`lax.fori_loop` over score-sorted candidates. Fully jittable, static output
shape (a keep mask), no host synchronization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerf_mae_tpu.ops.boxes import box_iou_aabb
from nerf_mae_tpu.ops.rotated_iou import box_iou_obb_pairwise


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    max_keep: Optional[int] = None,
) -> jnp.ndarray:
    """Greedy NMS. boxes [N, 6] (AABB) or [N, 7] (OBB); returns keep [N] bool.

    Semantics match the reference's greedy loop: visit candidates in
    descending score order; keep a candidate iff it is not suppressed by an
    already-kept higher-scoring box with IoU > threshold.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if boxes.shape[-1] == 6:
        iou = box_iou_aabb(boxes, boxes)
    else:
        iou = box_iou_obb_pairwise(boxes, boxes)

    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_sorted = iou[order][:, order]  # [N, N] in visiting order
    valid_sorted = valid[order]
    suppress = iou_sorted > iou_threshold

    def body(i, keep):
        # kept higher-ranked boxes that suppress candidate i
        killed = jnp.any(keep & suppress[:, i] & (jnp.arange(n) < i))
        return keep.at[i].set(valid_sorted[i] & ~killed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))

    if max_keep is not None:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (rank < max_keep)

    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def topk_by_score(
    scores: jnp.ndarray, k: int, valid: Optional[jnp.ndarray] = None
):
    """(values, indices, valid_out) for the top-k valid scores; static k."""
    masked = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, k)
    return vals, idx, jnp.isfinite(vals)
