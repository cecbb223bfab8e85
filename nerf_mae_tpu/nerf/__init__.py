from nerf_mae_tpu.nerf.model import NeRFMLP
from nerf_mae_tpu.nerf.render import (
    depth_and_std,
    depth_nll_loss,
    get_rays,
    render_rays,
    render_rays_depth_guided,
    render_rays_hierarchical,
    sample_3sigma,
    sample_pdf,
)
from nerf_mae_tpu.nerf.train import NeRFTrainer
from nerf_mae_tpu.nerf.extract import extract_rgbsigma_grid

__all__ = [
    "NeRFMLP",
    "get_rays",
    "render_rays",
    "render_rays_depth_guided",
    "render_rays_hierarchical",
    "sample_3sigma",
    "sample_pdf",
    "depth_and_std",
    "depth_nll_loss",
    "NeRFTrainer",
    "extract_rgbsigma_grid",
]
