from nerf_mae_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    grid_pspec,
    shard_batch,
    replicate,
    data_parallel_shardings,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "grid_pspec",
    "shard_batch",
    "replicate",
    "data_parallel_shardings",
]
