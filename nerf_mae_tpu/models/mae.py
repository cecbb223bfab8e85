"""SwinMAE3D — masked-autoencoder pretraining model (the flagship).

Capability match for the reference's SwinTransformer_MAE3D_New
(reference: nerf_mae/model/mae/swin_mae3d.py:1067-1599): Conv 4^3/s4 patch
embedding, fixed 3D sincos pos-embed, learned mask token, 4-stage Swin
encoder, UNETR skip decoder back to resolution^3 x 4, and the masked
reconstruction loss.

TPU-native deltas from the reference:
  * one static-shape batch [B, R, R, R, 4] + `sizes [B, 3]` instead of
    python lists of variable tensors padded in a loop
  * masking is a vectorized per-sample Bernoulli block mask drawn from an
    explicit rng (reference shares one python-loop mask across the batch)
  * channel-last layout, bf16 compute / fp32 params, optional remat
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_mae_tpu.config import MAEConfig
from nerf_mae_tpu.models.swin import SwinEncoder3D
from nerf_mae_tpu.models.unetr import (
    SubpixelHead3D,
    UnetOutBlock3D,
    UnetrUpBlock3D,
)
from nerf_mae_tpu.ops.masking import block_mask_3d
from nerf_mae_tpu.ops.patchify import (
    maybe_unflatten_patches,
    patchify_3d,
    voxel_validity_mask,
)
from nerf_mae_tpu.ops.pos_embed import sincos_pos_embed_3d


class _PatchEmbed(nn.Module):
    """Patch embedding with two equivalent compute paths over ONE param set
    (kernel [p, p, p, Cin, E] + bias [E], tree-identical to nn.Conv so
    checkpoints interop):

      * voxel path: Conv k=s=patch over [B, R, R, R, Cin] — the reference
        formulation (reference: swin_mae3d.py:1120-1129)
      * patched path: dense einsum over host-pre-patchified input
        [B, T, T, T, p^3, Cin] (see patchify_3d — its (i, j, k) C-order
        flatten matches the conv kernel layout). The conv's cost on TPU is
        dominated by the 4-channel-minor input layout transpose
        (PERF.md "patch-embed reformulations"); pre-patchifying on the
        (pipelined) host turns it into one MXU-friendly [.., p^3*Cin] @ E
        matmul with K = 256.
    """

    embed_dim: int
    patch: int
    in_channels: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, p, self.in_channels, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        if x.ndim == 6:  # patched input [B, T, T, T, p^3, Cin]
            k = kernel.astype(self.dtype).reshape(
                p**3 * self.in_channels, self.embed_dim
            )
            b_, t = x.shape[0], x.shape[1]
            flat = x.astype(self.dtype).reshape(b_, t, t, t, -1)
            return flat @ k + bias.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(p, p, p),
            padding="VALID",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )
        return out + bias.astype(self.dtype)


class SwinMAE3D(nn.Module):
    cfg: MAEConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        # patch embedding: Conv k=s=patch + LayerNorm
        # (reference: swin_mae3d.py:1120-1129)
        self.patch_embed = _PatchEmbed(
            cfg.swin.embed_dim,
            cfg.swin.patch_size[0],
            in_channels=cfg.input_channels,
            dtype=dtype,
        )
        self.patch_norm = nn.LayerNorm(epsilon=cfg.swin.norm_eps, dtype=jnp.float32)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (cfg.swin.embed_dim,)
        )
        self.encoder = SwinEncoder3D(cfg=cfg.swin, dtype=dtype, remat=cfg.remat,
                                     remat_policy=cfg.remat_policy,
                                     remat_stages=cfg.remat_stages)
        # UNETR decode with skip connections from every encoder stage
        # (reference: swin_mae3d.py:1224-1257, 1486-1495). decoder_remat
        # trades a decoder-forward recompute for HBM (needed for the
        # reference-style unetr decoder's full-res activations).
        policy = (
            jax.checkpoint_policies.dots_saveable
            if cfg.remat_policy == "dots" else None
        )
        up_cls = (
            nn.remat(UnetrUpBlock3D, policy=policy) if cfg.decoder_remat
            else UnetrUpBlock3D
        )
        e = cfg.swin.embed_dim
        self.decoder4 = up_cls(e * 4, dtype=dtype)
        self.decoder3 = up_cls(e * 2, dtype=dtype)
        self.decoder2 = up_cls(e * 1, dtype=dtype)
        if cfg.decoder_type == "subpixel":
            head_cls = (
                nn.remat(SubpixelHead3D, policy=policy) if cfg.decoder_remat
                else SubpixelHead3D
            )
            self.subpixel_head = head_cls(
                cfg.out_channels, patch=cfg.swin.patch_size[0], dtype=dtype
            )
        else:
            self.decoder1 = up_cls(
                e // 2, upsample_factor=cfg.swin.patch_size[0], use_skip=False,
                dtype=dtype,
            )
            self.out_head = UnetOutBlock3D(cfg.out_channels, dtype=dtype)

    def embed(self, grids: jnp.ndarray) -> jnp.ndarray:
        """Patch-embed + pos-embed -> [B, T, T, T, C]. Input is either the
        voxel grid [B, R, R, R, 4] or its host-patchified form
        [B, T, T, T, p^3, 4] (patch-major train fast path; the dispatch
        is on input ndim — see the layout note in config.MAEConfig). The
        channel-flat patch-major form [B, T, T, T, p^3*4] (the preferred
        jit-argument layout, see maybe_unflatten_patches) is also taken."""
        cfg = self.cfg
        grids = maybe_unflatten_patches(
            grids, cfg.swin.patch_size[0], cfg.input_channels
        )
        x = self.patch_embed(grids.astype(cfg.dtype))
        x = self.patch_norm(x).astype(cfg.dtype)
        pos = jnp.asarray(sincos_pos_embed_3d(cfg.swin.embed_dim, x.shape[1]))
        return x + pos.astype(cfg.dtype)

    def __call__(
        self,
        grids: jnp.ndarray,  # [B, R, R, R, 4] or patched [B, T, T, T, p^3, 4]
        deterministic: bool = True,
        token_mask: Optional[jnp.ndarray] = None,  # [B, T, T, T] bool override
        patched_pred: bool = False,  # emit [B, r, r, r, p^3, 4] (train fast path)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (pred [B, R, R, R, 4] fp32 — or the exact patchify_3d
        permutation of it when patched_pred, which the subpixel head emits
        directly — and token_mask [B, T, T, T] bool)."""
        cfg = self.cfg
        x = self.embed(grids)
        # mask: replace masked tokens (pos-embed included) with the learned
        # mask token (reference: swin_mae3d.py:1461-1463, 1375-1380)
        if token_mask is None:
            token_mask = block_mask_3d(
                self.make_rng("mask"),
                grids.shape[0],
                cfg.token_grid,
                block=cfg.mask_block,
                p_remove=cfg.masking_prob,
                strategy=cfg.masking_strategy,
                per_sample=cfg.per_sample_mask,
            )
        x = jnp.where(token_mask[..., None], self.mask_token.astype(cfg.dtype), x)

        f = self.encoder(x, deterministic)
        d = self.decoder4(f[3], f[2])
        d = self.decoder3(d, f[1])
        d = self.decoder2(d, f[0])
        if cfg.decoder_type == "subpixel":
            pred = self.subpixel_head(
                d, patched=patched_pred
            )
        else:
            pred = self.out_head(self.decoder1(d))
            if patched_pred:
                pred = patchify_3d(pred, cfg.swin.patch_size[0])
        return pred.astype(jnp.float32), token_mask

    def encode(
        self, grids: jnp.ndarray, deterministic: bool = True
    ) -> List[jnp.ndarray]:
        """Unmasked feature pyramid for downstream backbones — the
        'load pretrained trunk, drop decoder' API
        (reference: feature_extractor.py:1155-1176, README.md:134-179)."""
        return self.encoder(self.embed(grids), deterministic)


def mae_loss(
    pred: jnp.ndarray,  # [B, R, R, R, 4] raw model output (alpha pre-sigmoid)
    target: jnp.ndarray,  # [B, R, R, R, 4] padded rgbsigma (alpha in [0, 1])
    token_mask: jnp.ndarray,  # [B, T, T, T] bool, True = masked
    sizes: jnp.ndarray,  # [B, 3] true scene extents
    cfg: MAEConfig,
):  # pred/target also accepted pre-patchified [B, T, T, T, p^3, 4]
    """The reference's masked-reconstruction loss, exactly
    (reference: swin_mae3d.py:1513-1563):

      * RGB: MSE over *all* voxels with target alpha > 0.01 (not only masked
        sites); the numerator sums 3 channels while the denominator counts
        voxels once — reproduced verbatim.
      * alpha: sigmoid then MSE over voxels that are both inside the valid
        (un-padded) extent and in a masked token patch.

    Returns (loss, aux) with aux = {loss_rgb, loss_alpha, n_rgb, n_alpha}.
    """
    p = cfg.swin.patch_size[0]
    pred = pred.astype(jnp.float32)
    target = maybe_unflatten_patches(
        target, p, cfg.input_channels
    ).astype(jnp.float32)

    # pred arrives either as the voxel grid or already in patched layout
    # (SwinMAE3D(..., patched_pred=True) — the same permutation this line
    # would apply)
    pred_p = pred if pred.ndim == 6 else patchify_3d(pred, p)
    tgt_p = target if target.ndim == 6 else patchify_3d(target, p)

    valid = voxel_validity_mask(sizes, cfg.resolution)  # [B, R, R, R]
    valid_p = patchify_3d(valid[..., None].astype(jnp.float32), p)[..., 0]
    # token grid == patch grid (both stride-4 over the voxel grid)
    mask_remove = valid_p * token_mask[..., None].astype(jnp.float32)

    tgt_rgb, tgt_alpha = tgt_p[..., :3], tgt_p[..., 3:]
    pred_rgb, pred_alpha = pred_p[..., :3], pred_p[..., 3:]

    alpha_mask = (tgt_alpha > 0.01).astype(jnp.float32)
    n_rgb = alpha_mask.sum()
    loss_rgb = ((pred_rgb - tgt_rgb) ** 2 * alpha_mask).sum() / jnp.maximum(
        n_rgb, 1.0
    )

    pred_alpha = jax.nn.sigmoid(pred_alpha)
    mr = mask_remove[..., None]
    n_alpha = mr.sum()
    loss_alpha = ((pred_alpha - tgt_alpha) ** 2 * mr).sum() / jnp.maximum(
        n_alpha, 1.0
    )

    loss = loss_rgb + loss_alpha
    return loss, {
        "loss_rgb": loss_rgb,
        "loss_alpha": loss_alpha,
        "n_rgb": n_rgb,
        "n_alpha": n_alpha,
    }


def pad_grids_to_batch(
    grids: List[np.ndarray], resolution: int, channel_first: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side convenience mirroring the reference's list-of-grids API
    (reference: swin_mae3d.py:1571-1574): pad each (4, H, W, D) [or
    (H, W, D, 4)] scene to resolution^3 and stack. Returns
    (batch [B, R, R, R, 4] float32, sizes [B, 3] int32)."""
    batch = np.zeros(
        (len(grids), resolution, resolution, resolution, 4), dtype=np.float32
    )
    sizes = np.zeros((len(grids), 3), dtype=np.int32)
    for i, g in enumerate(grids):
        g = np.asarray(g, dtype=np.float32)
        if channel_first and g.shape[0] == 4:
            g = np.moveaxis(g, 0, -1)
        h, w, d = g.shape[:3]
        batch[i, :h, :w, :d, :] = g
        sizes[i] = (h, w, d)
    return batch, sizes
