from nerf_mae_tpu.models.swin import SwinBlock3D, PatchMerging3D, SwinEncoder3D
from nerf_mae_tpu.models.unetr import UnetResBlock3D, UnetrUpBlock3D, UnetOutBlock3D
from nerf_mae_tpu.models.mae import SwinMAE3D, mae_loss

__all__ = [
    "SwinBlock3D",
    "PatchMerging3D",
    "SwinEncoder3D",
    "UnetResBlock3D",
    "UnetrUpBlock3D",
    "UnetOutBlock3D",
    "SwinMAE3D",
    "mae_loss",
]
