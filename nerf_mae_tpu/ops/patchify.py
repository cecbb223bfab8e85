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


def maybe_unflatten_patches(x: jnp.ndarray, patch: int,
                            channels: int = 4) -> jnp.ndarray:
    """Accept the channel-flat patch-major jit-argument layout.

    [B, T, T, T, patch^3 * channels] -> [B, T, T, T, patch^3, channels]
    (a free reshape: the flat form is the same C-order buffer). 6-D patched
    input and the dense voxel grid [B, R, R, R, channels] pass through
    unchanged — dispatch is on ndim + last-dim size, which never collide
    (channels != patch^3 * channels).

    Why the flat form exists: a [.., patch^3, channels] jit *argument*
    can force a padded TPU tiling on the tiny channel minor — measured
    10.13 vs 2.48 ms fwd+bwd on the patch embed under a standalone jit.
    Inside the full train step XLA hides the difference (241.5 vs
    241.8 ms A/B, PERF.md r5), so the flat default is a robustness
    choice: any jit boundary the batch crosses (the --device_data
    gather, future pipelines) gets the layout that cannot pad, at zero
    cost. Inside jit both forms reach the same [.., p^3*C] @ E matmul.
    """
    if x.ndim == 5 and x.shape[-1] == patch ** 3 * channels:
        return x.reshape(*x.shape[:4], patch ** 3, channels)
    return x


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
