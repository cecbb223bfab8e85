from nerf_mae_tpu.nerf.model import NeRFMLP
from nerf_mae_tpu.nerf.render import get_rays, render_rays
from nerf_mae_tpu.nerf.train import NeRFTrainer
from nerf_mae_tpu.nerf.extract import extract_rgbsigma_grid

__all__ = [
    "NeRFMLP",
    "get_rays",
    "render_rays",
    "NeRFTrainer",
    "extract_rgbsigma_grid",
]
