from nerf_mae_tpu.data.datasets import (
    SceneDataset,
    density_to_alpha,
    scannet_density_to_alpha,
    load_split,
    mae_batch_iterator,
    detection_batch_iterator,
    split_hypersim_dataset,
    synthetic_scenes,
)
from nerf_mae_tpu.data.pipeline import PrefetchIterator, prefetch

__all__ = [
    "SceneDataset",
    "density_to_alpha",
    "scannet_density_to_alpha",
    "load_split",
    "mae_batch_iterator",
    "detection_batch_iterator",
    "split_hypersim_dataset",
    "synthetic_scenes",
    "PrefetchIterator",
    "prefetch",
]
