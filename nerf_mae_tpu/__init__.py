"""nerf_mae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of NeRF-MAE (reference: zubair-irshad/NeRF-MAE).

Self-supervised 3D representation learning on NeRF radiance/density voxel
grids ("rgbsigma": [R,G,B,density] grids, typically 160^3), with a masked
autoencoder pretraining stage (3D Swin encoder + UNETR decoder) and
downstream 3D detection / voxel super-resolution / voxel semantic heads.

Design stance (TPU-first, not a port):
  * channel-last [B, H, W, D, C] layouts everywhere (XLA-native conv layout)
  * static shapes: scenes are padded to resolution^3 with validity masks that
    live as `sizes [B, 3]` int arrays, never per-sample Python loops
  * masking, augmentation, and losses are vectorized jittable functions of
    explicit `jax.random` keys
  * data parallelism via jax.sharding.Mesh + NamedSharding, collectives
    inserted by XLA
"""

__version__ = "0.1.0"
