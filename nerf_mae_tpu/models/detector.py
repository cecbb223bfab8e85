"""FCOSOverNeRF equivalent: backbone + FPN + FCOS head as one flax module.

(reference: nerf_rpn/model/fcos/fcos.py:339-474 FCOSOverNeRF;
run_fcos_pretrained.py:401-426 backbone selection)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from nerf_mae_tpu.config import SwinConfig
from nerf_mae_tpu.models.backbones import ResNetFPN, SwinFPN, VGGFPN
from nerf_mae_tpu.models.fcos import FCOSConfig, FCOSHead, fcos_loss, fcos_postprocess


class FCOSDetector(nn.Module):
    """grids [B, R, R, R, 4] + padded GT -> losses (train) or detections.

    backbone: "swin_t/s/b/l" (SwinFPN, graftable from MAE), "resnet",
    "vgg_AF", "vgg_EF".
    """

    swin: SwinConfig
    fcos: FCOSConfig
    backbone: str = "swin_s"
    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    output_objectness: bool = False  # include per-voxel score grids at eval

    def setup(self):
        if self.backbone.startswith("swin"):
            self.body = SwinFPN(
                swin=self.swin, out_channels=self.out_channels,
                dtype=self.dtype, remat=self.remat,
            )
        elif self.backbone == "resnet":
            self.body = ResNetFPN(out_channels=self.out_channels, dtype=self.dtype)
        elif self.backbone.startswith("vgg"):
            self.body = VGGFPN(
                config=self.backbone.split("_")[1],
                out_channels=self.out_channels, dtype=self.dtype,
            )
        else:
            raise ValueError(f"unknown backbone {self.backbone}")
        self.head = FCOSHead(cfg=self.fcos, in_channels=self.out_channels,
                             dtype=self.dtype)

    def __call__(
        self,
        grids: jnp.ndarray,
        sizes: jnp.ndarray,
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        training: bool = False,
    ):
        feats = self.body(grids, deterministic)
        logits, bbox_reg, ctr = self.head(feats, training)
        if training:
            return fcos_loss(
                self.fcos, logits, bbox_reg, ctr, gt_boxes, gt_valid, sizes
            )
        out = fcos_postprocess(self.fcos, logits, bbox_reg, ctr, sizes)
        if self.output_objectness:
            from nerf_mae_tpu.models.fcos import fcos_objectness

            for lvl, ob in enumerate(fcos_objectness(logits, ctr)):
                out[f"objectness_level{lvl}"] = ob
        return out
