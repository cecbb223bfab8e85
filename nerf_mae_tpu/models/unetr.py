"""UNETR-style conv decoder blocks (flax.linen), channel-last.

Capability match for the reference's unetr_block.py (UnetResBlock /
UnetrUpBlock / UnetOutBlock — reference: nerf_mae/model/mae/unetr_block.py:
23-200), TPU-native: NDHWC convs via flax (XLA picks MXU-friendly layouts),
instance norm as a fused mean/var normalization in fp32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm_3d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over spatial dims, no affine
    (matches torch nn.InstanceNorm3d defaults used by the reference)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2, 3), keepdims=True)
    var = x32.var(axis=(1, 2, 3), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class UnetResBlock3D(nn.Module):
    """conv3 -> IN -> lrelu -> conv3 -> IN (+ 1x1 shortcut) -> lrelu.

    (reference: unetr_block.py:23-93; LeakyReLU slope 0.01)
    """

    out_channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        k = (self.kernel_size,) * 3
        h = nn.Conv(self.out_channels, k, padding="SAME", dtype=self.dtype, name="conv1")(x)
        h = instance_norm_3d(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(self.out_channels, k, padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = instance_norm_3d(h)
        residual = x
        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv3"
            )(x)
            residual = instance_norm_3d(residual)
        return nn.leaky_relu(h + residual, negative_slope=0.01)


class UnetrUpBlock3D(nn.Module):
    """Transposed-conv upsample, optional skip concat, then a res block.

    (reference: unetr_block.py:119-200)
    """

    out_channels: int
    upsample_factor: int = 2
    kernel_size: int = 3
    use_skip: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        s = (self.upsample_factor,) * 3
        x = nn.ConvTranspose(
            self.out_channels, s, strides=s, padding="VALID", dtype=self.dtype,
            name="up",
        )(x)
        if self.use_skip:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return UnetResBlock3D(
            self.out_channels, self.kernel_size, dtype=self.dtype, name="res"
        )(x)


class SubpixelHead3D(nn.Module):
    """TPU-native reconstruction head: res-block + projection at the token
    grid, then depth-to-space to full resolution.

    Replaces the reference's decoder1 (ConvTranspose 4x) + full-res res
    block + 1x1 out (reference: unetr_block.py:119-200 applied at 160^3 in
    swin_mae3d.py:1248-1257, :1491-1495). All heavy convs run at T^3 = (R/p)^3
    where channel counts are MXU-friendly; the voxel grid is emitted by one
    reshape — no [B, R^3, smallC] activations ever materialize.
    """

    out_channels: int
    patch: int = 4
    width: int = 0  # 0 = keep input channel count
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, patched: bool = False) -> jnp.ndarray:
        b, t, _, _, c = x.shape
        w = self.width or c
        h = UnetResBlock3D(w, dtype=self.dtype, name="res")(x)
        p = self.patch
        h = nn.Conv(
            self.out_channels * p**3, (3, 3, 3), padding="SAME",
            dtype=self.dtype, name="proj",
        )(h)  # [B, T, T, T, p^3 * out]
        if patched:
            # patchify_3d(depth_to_space(h)) == this reshape exactly, so the
            # training loss can consume the prediction without either 524 MB
            # 6-D transpose (the emit below + the loss's patchify); ~20 ms
            # per swin_b@160^3 step on v5e. The channel-minor voxel grid is
            # only needed by inference/viz consumers.
            return h.reshape(b, t, t, t, p**3, self.out_channels)
        h = h.reshape(b, t, t, t, p, p, p, self.out_channels)
        h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return h.reshape(b, t * p, t * p, t * p, self.out_channels)


class UnetOutBlock3D(nn.Module):
    """1x1x1 conv head (reference: unetr_block.py:96-116)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv"
        )(x)
