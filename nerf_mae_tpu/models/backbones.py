"""Detection backbones: Swin-FPN (scratch or from a pretrained MAE trunk),
ResNet-FPN, VGG-FPN — channel-last, bf16 compute.

Capability match for the reference's feature_extractor.py backbones
(reference: nerf_rpn/model/feature_extractor.py:107-1290):
  * SwinFPN == SwinTransformer_FPN / _Pretrained_Skip — the same trunk as
    SwinMAE3D (patch embed + pos embed + 4 stages) so MAE checkpoints graft
    directly (train/checkpoint.py load_trunk_into), followed by FPN3D
  * ResNetFPN == ResNet_FPN_{64,256} bottleneck variants
  * VGGFPN == VGG_FPN configs (AF/EF)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerf_mae_tpu.config import SwinConfig
from nerf_mae_tpu.models.fpn import FPN3D
from nerf_mae_tpu.models.swin import SwinEncoder3D
from nerf_mae_tpu.ops.pos_embed import sincos_pos_embed_3d


class SwinFPN(nn.Module):
    """Swin trunk + FPN. Param tree deliberately shares the MAE trunk's
    submodule names (patch_embed/patch_norm/encoder) so a pretrained MAE
    checkpoint grafts in unchanged — the TPU equivalent of the reference's
    'load ckpt, delete decoder, add FPN' surgery
    (reference: feature_extractor.py:1155-1176)."""

    swin: SwinConfig
    input_channels: int = 4
    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True

    def setup(self):
        self.patch_embed = nn.Conv(
            self.swin.embed_dim,
            tuple(self.swin.patch_size),
            strides=tuple(self.swin.patch_size),
            padding="VALID",
            dtype=self.dtype,
        )
        self.patch_norm = nn.LayerNorm(epsilon=self.swin.norm_eps, dtype=jnp.float32)
        self.encoder = SwinEncoder3D(cfg=self.swin, dtype=self.dtype, remat=self.remat)
        self.fpn = FPN3D(out_channels=self.out_channels, num_outs=len(self.swin.depths), dtype=self.dtype)

    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        x = self.patch_embed(grids.astype(self.dtype))
        x = self.patch_norm(x).astype(self.dtype)
        pos = jnp.asarray(sincos_pos_embed_3d(self.swin.embed_dim, x.shape[1]))
        x = x + pos.astype(self.dtype)
        feats = self.encoder(x, deterministic)
        return self.fpn(feats)


class _Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 residual bottleneck with instance-norm-free
    GroupNorm(32) (TPU-friendly; reference uses BatchNorm at
    feature_extractor.py:62-105)."""

    channels: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.channels * self.expansion
        h = nn.Conv(self.channels, (1, 1, 1), dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(num_groups=min(32, self.channels), name="n1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.channels, (3, 3, 3), strides=(self.stride,) * 3,
            padding="SAME", dtype=self.dtype, name="conv2",
        )(h)
        h = nn.GroupNorm(num_groups=min(32, self.channels), name="n2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1, 1), dtype=self.dtype, name="conv3")(h)
        h = nn.GroupNorm(num_groups=32, name="n3")(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(
                out_ch, (1, 1, 1), strides=(self.stride,) * 3,
                dtype=self.dtype, name="proj",
            )(x)
            x = nn.GroupNorm(num_groups=32, name="np")(x)
        return nn.relu(h + x)


class ResNetFPN(nn.Module):
    """ResNet-FPN backbone (reference: feature_extractor.py:107-301,
    ResNet_FPN_64/256). Stem stride 4 (patch-like), then 4 bottleneck stages
    at strides [4, 8, 16, 32], FPN on top."""

    base_channels: int = 64
    blocks_per_stage: Sequence[int] = (2, 2, 2, 2)
    input_channels: int = 4
    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        x = nn.Conv(
            self.base_channels, (7, 7, 7), strides=(4, 4, 4), padding="SAME",
            dtype=self.dtype, name="stem",
        )(grids.astype(self.dtype))
        x = nn.GroupNorm(num_groups=32, name="stem_norm")(x)
        x = nn.relu(x)
        feats = []
        ch = self.base_channels
        for i, n_blocks in enumerate(self.blocks_per_stage):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = _Bottleneck(
                    channels=ch, stride=stride, dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x)
            feats.append(x)
            ch *= 2
        return FPN3D(
            out_channels=self.out_channels, num_outs=len(feats),
            dtype=self.dtype, name="fpn",
        )(feats)


class VGGFPN(nn.Module):
    """VGG-style conv backbone + FPN (reference: feature_extractor.py:
    345-549, configs 'AF'/'EF'). Plain conv-GN-relu chains with maxpool
    downsamples; feature taps before each pool beyond the first."""

    config: str = "AF"  # AF: shallow; EF: deep
    input_channels: int = 4
    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    _CFGS = {
        # channels per stage, convs per stage
        "AF": ((64, 128, 256, 512, 512), (1, 1, 2, 2, 2)),
        "EF": ((64, 128, 256, 512, 512), (2, 2, 4, 4, 4)),
    }

    @nn.compact
    def __call__(self, grids: jnp.ndarray, deterministic: bool = True):
        chans, convs = self._CFGS[self.config]
        x = grids.astype(self.dtype)
        feats = []
        for i, (ch, n) in enumerate(zip(chans, convs)):
            for j in range(n):
                x = nn.Conv(
                    ch, (3, 3, 3), padding="SAME", dtype=self.dtype,
                    name=f"stage{i}_conv{j}",
                )(x)
                x = nn.GroupNorm(num_groups=min(32, ch), name=f"stage{i}_norm{j}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            if i >= 1:  # strides 4, 8, 16, 32
                feats.append(x)
        return FPN3D(
            out_channels=self.out_channels, num_outs=len(feats),
            dtype=self.dtype, name="fpn",
        )(feats)
