"""Downstream dense heads: voxel super-resolution and voxel semantics.

Capability match for the reference's SwinTransformer_VoxelSR_* and
SwinTransformer_VoxelSemantics_* families (reference: nerf_rpn/model/
feature_extractor.py:1310-3974). Both reuse the *pretrained MAE* trunk AND
its decoder4/3/2 (the reference deletes only decoder1/out/mask_token —
feature_extractor.py:2008-2012), then add:

  * encoder1: a conv block on the raw 160^3 input, used as the skip for
  * decoder1: up-4x block fusing dec1 with enc1 -> [B, R, R, R, C/2]
  * VoxelSR: fractional nearest upsample to 256/384 + 1x1 conv -> 4 channels
    (reference: feature_extractor.py:2020-2052)
  * VoxelSemantics: 1x1 conv -> num_classes logits at 160^3

Param subtree names match SwinMAE3D so checkpoint grafting is a tree copy
(train/checkpoint.py, TRUNK+DECODER keys).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_mae_tpu.config import MAEConfig
from nerf_mae_tpu.models.swin import SwinEncoder3D
from nerf_mae_tpu.models.unetr import (
    UnetOutBlock3D,
    UnetResBlock3D,
    UnetrUpBlock3D,
)
from nerf_mae_tpu.ops.pos_embed import sincos_pos_embed_3d


class _MAETrunkWithDecoder(nn.Module):
    """Shared: patch embed + encoder + MAE decoder4/3/2, mirroring the
    reusable part of SwinMAE3D's param tree."""

    cfg: MAEConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        self.patch_embed = nn.Conv(
            cfg.swin.embed_dim,
            tuple(cfg.swin.patch_size),
            strides=tuple(cfg.swin.patch_size),
            padding="VALID",
            dtype=dtype,
        )
        self.patch_norm = nn.LayerNorm(epsilon=cfg.swin.norm_eps, dtype=jnp.float32)
        self.encoder = SwinEncoder3D(cfg=cfg.swin, dtype=dtype, remat=cfg.remat,
                                     remat_policy=cfg.remat_policy)
        up_cls = nn.remat(UnetrUpBlock3D) if cfg.remat else UnetrUpBlock3D
        e = cfg.swin.embed_dim
        self.decoder4 = up_cls(e * 4, dtype=dtype)
        self.decoder3 = up_cls(e * 2, dtype=dtype)
        self.decoder2 = up_cls(e * 1, dtype=dtype)

    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        x = self.patch_embed(grids.astype(cfg.dtype))
        x = self.patch_norm(x).astype(cfg.dtype)
        pos = jnp.asarray(sincos_pos_embed_3d(cfg.swin.embed_dim, x.shape[1]))
        x = x + pos.astype(cfg.dtype)
        f = self.encoder(x, deterministic)
        d = self.decoder4(f[3], f[2])
        d = self.decoder3(d, f[1])
        return self.decoder2(d, f[0])  # [B, T, T, T, C]


# param subtrees grafted from a pretrained MAE checkpoint into these heads
SR_TRUNK_KEYS = (
    "patch_embed", "patch_norm", "encoder", "decoder4", "decoder3", "decoder2",
)


class VoxelSR3D(nn.Module):
    """160^3 rgbsigma -> out_resolution^3 rgbsigma super-resolution
    (reference: feature_extractor.py:1898-2243)."""

    cfg: MAEConfig
    out_resolution: int = 256

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        e = cfg.swin.embed_dim
        self.base = _MAETrunkWithDecoder(cfg)
        self.encoder1 = UnetResBlock3D(e // 2, dtype=dtype)
        up_cls = nn.remat(UnetrUpBlock3D) if cfg.remat else UnetrUpBlock3D
        self.decoder1 = up_cls(
            e // 2, upsample_factor=cfg.swin.patch_size[0], use_skip=True,
            dtype=dtype,
        )
        self.voxel_out = UnetOutBlock3D(4, dtype=dtype)

    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        enc1 = self.encoder1(grids.astype(self.cfg.dtype))
        d = self.base(grids, deterministic)
        d = self.decoder1(d, enc1)  # [B, R, R, R, C/2]
        r = self.out_resolution
        d = jax.image.resize(
            d, (d.shape[0], r, r, r, d.shape[-1]), method="nearest"
        )
        return self.voxel_out(d).astype(jnp.float32)


def voxel_sr_loss(pred: jnp.ndarray, target_hi: jnp.ndarray):
    """Alpha-masked RGB MSE against the padded high-res target
    (reference: feature_extractor.py:2134-2161). Returns (loss, aux)."""
    target_hi = target_hi.astype(jnp.float32)
    mask = (target_hi[..., 3:] > 0.01).astype(jnp.float32)
    se = (pred[..., :3] - target_hi[..., :3]) ** 2 * mask
    n = jnp.maximum(mask.sum(), 1.0)
    loss = se.sum() / n
    mse = (se.sum() / jnp.maximum((mask * 3).sum(), 1.0))
    return loss, {"mse": mse, "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))}


class VoxelSemantics3D(nn.Module):
    """160^3 rgbsigma -> per-voxel class logits
    (reference: feature_extractor.py:2521-2847)."""

    cfg: MAEConfig
    num_classes: int = 19

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        e = cfg.swin.embed_dim
        self.base = _MAETrunkWithDecoder(cfg)
        self.encoder1 = UnetResBlock3D(e // 2, dtype=dtype)
        up_cls = nn.remat(UnetrUpBlock3D) if cfg.remat else UnetrUpBlock3D
        self.decoder1 = up_cls(
            e // 2, upsample_factor=cfg.swin.patch_size[0], use_skip=True,
            dtype=dtype,
        )
        self.sem_out = UnetOutBlock3D(self.num_classes, dtype=dtype)

    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        enc1 = self.encoder1(grids.astype(self.cfg.dtype))
        d = self.base(grids, deterministic)
        d = self.decoder1(d, enc1)
        return self.sem_out(d).astype(jnp.float32)  # [B, R, R, R, classes]


def voxel_semantics_loss(
    logits: jnp.ndarray,  # [B, R, R, R, C]
    target: jnp.ndarray,  # [B, R, R, R] int labels (0 = void)
    class_weights: jnp.ndarray = None,  # [C]
):
    """Weighted masked cross-entropy + soft-mIoU metric
    (reference: feature_extractor.py:2694-2746; metrics.py:540-553
    masked_cross_entropy — targets and logits are zeroed outside the mask,
    CE is a weighted mean over all voxels)."""
    c = logits.shape[-1]
    mask = (target > 0).astype(jnp.float32)
    t = (target * mask).astype(jnp.int32)
    lg = logits * mask[..., None]
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights[t]
        ce = (nll * w).sum() / jnp.maximum(w.sum(), 1e-9)
    else:
        ce = nll.mean()

    # soft mIoU metric over valid voxels (reference: metrics.py mIoULoss_new)
    probs = jax.nn.softmax(logits, axis=-1) * mask[..., None]
    onehot = jax.nn.one_hot(t, c) * mask[..., None]
    inter = (probs * onehot).sum(axis=(0, 1, 2, 3))
    union = (probs + onehot - probs * onehot).sum(axis=(0, 1, 2, 3))
    present = onehot.sum(axis=(0, 1, 2, 3)) > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1e-9), 0.0)
    miou = iou.sum() / jnp.maximum(present.sum(), 1.0)
    return ce, {"ce": ce, "soft_miou": miou}


def calculate_class_weights(label_grids, num_classes: int, c: float = 1.02):
    """Log-propensity class weights from training label grids
    (reference: metrics.py:383-427): w_k = 1 / log(c + freq_k), void class
    zeroed."""
    import numpy as np

    counts = np.zeros(num_classes, np.float64)
    total = 0
    for grid in label_grids:
        flat = np.asarray(grid).reshape(-1)
        flat = flat[flat != 0]
        counts += np.bincount(flat, minlength=num_classes)[:num_classes]
        total += flat.size
    counts[0] = 0
    weights = 1.0 / np.log(c + counts / max(total, 1))
    weights[0] = 0.0
    return weights.astype(np.float32)


def intersection_and_union(
    pred_labels, target, num_classes: int, ignore_zero: bool = True
):
    """Hard confusion counts for mIoU/mAcc/allAcc eval
    (reference: metrics.py:491-538 intersectionAndUnionGPU). numpy host-side.
    Voxels with target==0 are excluded (void)."""
    import numpy as np

    pred_labels = np.asarray(pred_labels).reshape(-1)
    target = np.asarray(target).reshape(-1)
    if ignore_zero:
        keep = target > 0
        pred_labels, target = pred_labels[keep], target[keep]
    inter = pred_labels[pred_labels == target]
    area_inter = np.histogram(inter, bins=num_classes, range=(0, num_classes - 1))[0]
    area_pred = np.histogram(pred_labels, bins=num_classes, range=(0, num_classes - 1))[0]
    area_tgt = np.histogram(target, bins=num_classes, range=(0, num_classes - 1))[0]
    return area_inter, area_pred + area_tgt - area_inter, area_tgt
