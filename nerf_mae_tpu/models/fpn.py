"""3D Feature Pyramid Network neck, channel-last.

Capability match for the reference FPN (reference: nerf_rpn/model/fpn.py:
8-185): lateral 1x1 convs + nearest-neighbor top-down fusion + 3x3 smoothing
convs, with optional extra stride-2 conv levels (RetinaNet-style) or maxpool
extra levels. TPU-native: NDHWC convs, upsampling as a reshape-broadcast
(XLA fuses it into the add).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp


def nearest_upsample_3d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B, W, L, H, C] nearest-neighbor upsample by an integer factor."""
    b, w, l, h, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :],
        (b, w, factor, l, factor, h, factor, c),
    )
    return x.reshape(b, w * factor, l * factor, h * factor, c)


class FPN3D(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    extra_convs: bool = False  # stride-2 convs for levels beyond the trunk
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        n_in = len(features)
        laterals = [
            nn.Conv(
                self.out_channels, (1, 1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name=f"lateral{i}",
            )(f.astype(self.dtype))
            for i, f in enumerate(features)
        ]
        for i in range(n_in - 1, 0, -1):
            up = nearest_upsample_3d(laterals[i], laterals[i - 1].shape[1] // laterals[i].shape[1])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(
                self.out_channels, (3, 3, 3), padding="SAME", dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name=f"smooth{i}",
            )(laterals[i])
            for i in range(n_in)
        ]
        for i in range(n_in, self.num_outs):
            if self.extra_convs:
                outs.append(
                    nn.Conv(
                        self.out_channels, (3, 3, 3), strides=(2, 2, 2),
                        padding="SAME", dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"extra{i}",
                    )(outs[-1])
                )
            else:
                outs.append(nn.max_pool(outs[-1], (1, 1, 1), strides=(2, 2, 2)))
        return outs
