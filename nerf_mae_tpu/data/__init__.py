from nerf_mae_tpu.data.datasets import (
    SceneDataset,
    density_to_alpha,
    scannet_density_to_alpha,
    load_split,
    mae_batch_iterator,
    synthetic_scenes,
)

__all__ = [
    "SceneDataset",
    "density_to_alpha",
    "scannet_density_to_alpha",
    "load_split",
    "mae_batch_iterator",
    "synthetic_scenes",
]
