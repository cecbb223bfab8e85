"""Patchify / unpatchify for 3D rgbsigma grids, channel-last.

Reference semantics: patchify_3d / unpatchify_3d_full
(reference: nerf_mae/model/mae/swin_mae3d.py:1384-1430), re-expressed for
channel-last [B, H, W, D, C] layouts (TPU-native) instead of NCDHW.

Also provides the static-shape replacement for the reference's per-sample
pad_tensor loop (reference: torch_utils.py:56-90 + swin_mae3d.py:1432-1448):
validity is a pure function of a `sizes [B, 3]` int array.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_3d(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, R, R, R, C] -> [B, r, r, r, patch^3, C] with r = R // patch.

    Voxel order inside a patch is (h, w, d) row-major, matching the
    reference's einops 'n c h p w q l r -> n h w l (p q r) c'.
    """
    b, h, w, d, c = x.shape
    r = h // patch
    x = x.reshape(b, r, patch, r, patch, r, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, r, r, r, patch**3, c)


def patchify_np(x, patch: int):
    """Host-side (numpy) patchify_3d for the patch-major input pipeline:
    [B, R, R, R, C] -> [B, r, r, r, patch^3, C], same ordering as
    patchify_3d. Runs on the prefetch worker so the device never pays the
    channel-minor layout transpose."""
    import numpy as np

    b, h, w, d, c = x.shape
    r = h // patch
    x = np.ascontiguousarray(x).reshape(b, r, patch, r, patch, r, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return np.ascontiguousarray(x).reshape(b, r, r, r, patch**3, c)


def unpatchify_3d(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Inverse of patchify_3d: [B, r, r, r, patch^3, C] -> [B, R, R, R, C]."""
    b, r, _, _, _, c = x.shape
    x = x.reshape(b, r, r, r, patch, patch, patch, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, r * patch, r * patch, r * patch, c)


def voxel_validity_mask(sizes: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """[B, 3] per-sample true grid sizes -> [B, R, R, R] bool validity.

    True where the voxel is inside the un-padded scene extent. Replaces the
    reference's materialized pad masks with an analytic function so batches
    stay static-shape.
    """
    b = sizes.shape[0]
    ih = jnp.arange(resolution)
    valid_h = ih[None, :] < sizes[:, 0:1]  # [B, R]
    valid_w = ih[None, :] < sizes[:, 1:2]
    valid_d = ih[None, :] < sizes[:, 2:3]
    return (
        valid_h[:, :, None, None]
        & valid_w[:, None, :, None]
        & valid_d[:, None, None, :]
    )
