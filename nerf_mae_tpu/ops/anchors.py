"""3D anchor generation + IoU matcher + balanced sampler, static shapes.

Capability match for the reference's anchor machinery
(reference: nerf_rpn/model/anchor.py:14-174 AnchorGenerator3D;
model/utils.py:35-96 BalancedPositiveNegativeSampler, :98-213 Matcher).

TPU re-design: anchors are a compile-time numpy constant per (resolution,
strides, sizes, ratios); matching is one [G, A] tensor op per scene vmapped
over the batch; the sampler turns torch's randperm-and-index into a
rank-vs-threshold mask (static shapes, traced counts).
"""

from __future__ import annotations

import functools
import itertools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ANCHOR_SIZES = ((8.0,), (16.0,), (32.0,), (64.0,))
DEFAULT_ASPECT_RATIOS = ((1, 1, 1), (1, 1, 2), (1, 2, 2), (1, 1, 3), (1, 3, 3))


def base_anchors_for_level(
    sizes: Sequence[float], ratios: Sequence[Tuple[float, float, float]],
    normalize: bool = False,
) -> np.ndarray:
    """[A0, 6] zero-centered base anchors; ratios expand to their unique
    axis permutations (reference: anchor.py:51-82)."""
    perms = []
    for r in ratios:
        uniq = sorted(set(itertools.permutations(r)))
        if normalize:
            w = float(np.prod(r)) ** (1.0 / 3.0)
            uniq = [tuple(x / w for x in p) for p in uniq]
        perms.extend(uniq)
    perms = np.asarray(perms, np.float32)  # [P, 3]
    scales = np.asarray(sizes, np.float32)
    whd = (perms[:, None, :] * scales[None, :, None]).reshape(-1, 3)
    return np.round(np.concatenate([-whd / 2, whd / 2], axis=1))


@functools.lru_cache(maxsize=8)
def grid_anchors(
    resolution: int,
    strides: Tuple[int, ...],
    sizes: Tuple[Tuple[float, ...], ...] = DEFAULT_ANCHOR_SIZES,
    ratios: Tuple[Tuple[float, float, float], ...] = DEFAULT_ASPECT_RATIOS,
    normalize: bool = False,
):
    """Static anchors over the padded grid.

    Returns (anchors [A, 6] fp32, centers [A, 3], level_id [A] int32,
    anchors_per_level list). Anchor centers sit at stride * idx
    (reference: anchor.py:98-122 — shifts are stride * index, zero offset).
    """
    all_anchors, all_centers, level_ids, per_level = [], [], [], []
    for lvl, s in enumerate(strides):
        base = base_anchors_for_level(sizes[lvl], ratios, normalize)  # [A0, 6]
        n = int(np.ceil(resolution / s))
        ax = np.arange(n, dtype=np.float32) * s
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        shifts = np.stack(
            [gx.ravel(), gy.ravel(), gz.ravel()] * 2, axis=1
        )  # [L, 6]
        a = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 6)
        all_anchors.append(a)
        centers = np.repeat(shifts[:, :3], base.shape[0], axis=0)
        all_centers.append(centers)
        level_ids.append(np.full((a.shape[0],), lvl, np.int32))
        per_level.append(a.shape[0])
    return (
        np.concatenate(all_anchors).astype(np.float32),
        np.concatenate(all_centers).astype(np.float32),
        np.concatenate(level_ids),
        per_level,
    )


def anchor_padding_mask(centers: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """[A, 3] anchor cell centers + [B, 3] scene extents -> [B, A] validity.

    Mirrors the reference's ceil(ori/stride) cell-count rule
    (reference: anchor.py:124-152): a cell at index i (coordinate i*stride)
    is valid iff i < ceil(size/stride) <=> i*stride < size.
    """
    return jnp.all(centers[None] < sizes[:, None, :], axis=-1)


BELOW_LOW = -1
BETWEEN = -2


def match_anchors(
    quality: jnp.ndarray,  # [G, A] IoU, rows of invalid gts arbitrary
    gt_valid: jnp.ndarray,  # [G]
    anchor_valid: jnp.ndarray,  # [A]
    low_thresh: float,
    high_thresh: float,
    allow_low_quality: bool = True,
):
    """Vectorized torchvision Matcher (reference: model/utils.py:98-213 and
    its use in rpn.py:240-290). Returns (labels [A] in {1, 0, -1},
    matched_gt [A] int32 — argmax gt index, clamped valid)."""
    q = jnp.where(gt_valid[:, None], quality, -jnp.inf)
    q = jnp.where(anchor_valid[None, :], q, -1.0)  # masked anchors -> quality -1
    best_val = q.max(axis=0)  # [A]
    best_gt = jnp.argmax(q, axis=0).astype(jnp.int32)

    labels = jnp.where(
        best_val >= high_thresh,
        1.0,
        jnp.where(best_val < low_thresh, 0.0, -1.0),
    )
    if allow_low_quality:
        gt_best = q.max(axis=1, keepdims=True)  # [G, 1]
        restore = jnp.any(
            (q == gt_best) & gt_valid[:, None] & (gt_best > 0), axis=0
        )
        labels = jnp.where(restore, 1.0, labels)
    labels = jnp.where(anchor_valid, labels, -1.0)
    return labels, best_gt


def balanced_sample(
    rng: jax.Array,
    labels: jnp.ndarray,  # [A] in {1, 0, -1}
    batch_size: int,
    positive_fraction: float,
):
    """Random balanced pos/neg selection masks
    (reference: model/utils.py:35-96). Returns (pos_mask, neg_mask) [A]."""
    a = labels.shape[0]
    r = jax.random.uniform(rng, (a,))
    pos = labels == 1.0
    neg = labels == 0.0

    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(pos.sum(), max_pos)
    num_neg = jnp.minimum(neg.sum(), batch_size - num_pos)

    # rank positives (and negatives) by random priority; keep the first k
    pos_order = jnp.argsort(jnp.where(pos, r, jnp.inf))
    pos_rank = jnp.zeros((a,), jnp.int32).at[pos_order].set(jnp.arange(a, dtype=jnp.int32))
    neg_order = jnp.argsort(jnp.where(neg, r, jnp.inf))
    neg_rank = jnp.zeros((a,), jnp.int32).at[neg_order].set(jnp.arange(a, dtype=jnp.int32))

    return pos & (pos_rank < num_pos), neg & (neg_rank < num_neg)
