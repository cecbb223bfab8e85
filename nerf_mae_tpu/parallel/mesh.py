"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack
(reference: nerf_mae/run_swin_mae3d.py:809-902 — mp.spawn, process groups,
DistributedSampler, rank-gated eval): here a 1-D `data` mesh + NamedSharding
annotations let XLA insert all collectives (grad psum, metric pmean) itself.
Multi-host extends by calling jax.distributed.initialize() before make_mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices.

    Raises if fewer than n_devices exist — a silently truncated mesh would
    make a "multi-chip" dryrun prove nothing.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: asked for {n_devices} devices but only "
                f"{len(devices)} present on platform "
                f"{devices[0].platform if devices else '?'}; for a virtual "
                "multi-device run set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(n_data: Optional[int] = None, n_space: int = 1) -> Mesh:
    """[data, space] mesh for combined data + spatial (grid) parallelism.

    The `space` axis shards the voxel grid's first spatial dimension across
    devices — the 3D analogue of sequence/context parallelism, and a
    capability the reference does not have at all (SURVEY §5: its
    scalability over the 64k-token grid is purely architectural). GSPMD
    inserts the halo exchanges (3^3 decoder convs, shifted-window rolls)
    from the sharding annotations alone; window attention stays local
    because windows never span the shard boundary after the halo'd roll.
    Use: batch per-sample activations no longer fit one chip's HBM
    (high-res VoxelSR, swin_l at 160^3+) or batch < n_chips.

    n_data=None uses all remaining devices (len(devices) // n_space).
    """
    devices = jax.devices()
    if n_space < 1:
        raise ValueError(f"n_space must be >= 1, got {n_space}")
    if n_data is None:
        n_data = len(devices) // n_space
    need = n_data * n_space
    if len(devices) < need or n_data < 1:
        raise RuntimeError(
            f"make_mesh_2d: asked for {n_data}x{n_space} devices but only "
            f"{len(devices)} present; for a virtual run set JAX_PLATFORMS=cpu "
            f"and XLA_FLAGS=--xla_force_host_platform_device_count={need}"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, ("data", "space"))


def grid_pspec(mesh: Mesh) -> P:
    """PartitionSpec for [B, R, R, R, C] voxel-grid batches on this mesh:
    batch over `data`, first spatial dim over `space` when present."""
    if is_spatial(mesh):
        return P("data", "space")
    return P("data")


def is_spatial(mesh: Optional[Mesh]) -> bool:
    """True when the mesh has a >1-sized `space` axis."""
    return (
        mesh is not None
        and "space" in mesh.axis_names
        and mesh.shape["space"] > 1
    )


def prepare_spatial_config(mesh: Optional[Mesh], swin_cfg):
    """Adjust a SwinConfig for spatial sharding; no-op on 1-D meshes.

    - attention_impl='pallas' is rejected: pallas_call has no GSPMD
      partitioning rule, so the kernels would replicate or fail to lower.
    - 'auto' routes to 'xla' (GSPMD partitions window attention with halo
      exchanges automatically).
    - The jax-0.9 Shardy partitioner is switched off for the process: it
      miscompiles the backward of a space-replicated operand feeding the
      chained strided-ConvTranspose decoder (cotangent overcounted exactly
      n_space times; parameter grads unaffected; finite-difference
      verified — minimal repro in tests/test_spatial.py). The legacy GSPMD
      partitioner computes it correctly.
    """
    import dataclasses

    if not is_spatial(mesh):
        return swin_cfg
    if swin_cfg.attention_impl == "pallas":
        raise ValueError(
            "attention_impl='pallas' cannot run under spatial sharding; "
            "use 'xla' (GSPMD partitions the window attention with halo "
            "exchanges automatically)"
        )
    if jax.config.jax_use_shardy_partitioner:
        import logging

        logging.getLogger(__name__).warning(
            "spatial mesh: disabling the Shardy partitioner "
            "(replicated-operand cotangent overcount through the "
            "ConvTranspose decoder chain; see tests/test_spatial.py)"
        )
        jax.config.update("jax_use_shardy_partitioner", False)
    if swin_cfg.attention_impl == "auto":
        return dataclasses.replace(swin_cfg, attention_impl="xla")
    return swin_cfg


def data_parallel_shardings(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated_sharding) for the given mesh."""
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                transfer_dtype: Optional[str] = None,
                specs: Optional[dict] = None,
                flatten_patches: Optional[bool] = None):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh.

    Single-process: a plain device_put. Multi-process (multi-host TPU pods,
    jax.distributed.initialize already called): each process passes its
    *local* per-host batch and the pieces are assembled into one global
    array — the jax-native analogue of the reference's DistributedSampler
    feeding each DDP rank its slice (reference: run_swin_mae3d.py:578-586).

    transfer_dtype ("bfloat16"/"float16") downcasts float32 leaves on the
    host before the transfer, halving host->device bytes. The models cast
    inputs to their compute dtype anyway (usually bf16), so training only
    sees quantized *targets* — negligible against recon-level PSNR, and a
    2x win when the interconnect (PCIe, or this VM's tunnel) is the
    bottleneck (PERF.md finding 5).

    flatten_patches (default on; NERF_MAE_FLAT_TRANSFER=0 disables):
    patch-major 6-D leaves [B, T, T, T, p^3, C] are reshaped channel-flat
    [B, T, T, T, p^3*C] before the transfer — a free host reshape to the
    one layout whose tiny-minor tiling cannot pad at a jit boundary
    (ops.patchify.maybe_unflatten_patches has the measured A/B; the
    model/loss accept both forms).
    """
    if flatten_patches is None:
        flatten_patches = os.environ.get("NERF_MAE_FLAT_TRANSFER", "1") == "1"
    if flatten_patches:
        batch = jax.tree.map(
            lambda x: x.reshape(*x.shape[:4], -1)
            if getattr(x, "ndim", 0) == 6 else x, batch
        )
    if transfer_dtype and transfer_dtype != "float32":
        import ml_dtypes

        td = dict(bfloat16=ml_dtypes.bfloat16, float16=np.float16)[transfer_dtype]
        # only the voxel-grid tensors (ndim >= 4): quantizing small
        # per-scene metadata (gt boxes, sizes) can make boxes degenerate
        # (min == max after rounding -> log(0) in delta coders)
        cast = lambda x: (
            x.astype(td)
            if getattr(x, "dtype", None) == np.float32
            and getattr(x, "ndim", 0) >= 4 else x
        )
        batch = jax.tree.map(cast, batch)
    # specs: optional {top-level key: PartitionSpec} overrides for dict
    # batches (e.g. {"grids": P("data", "space")} on a 2-D mesh); leaves
    # without an override shard P(axis)
    default = NamedSharding(mesh, P(axis))

    def _sharding(key):
        if specs is not None and key in specs:
            return NamedSharding(mesh, specs[key])
        return default

    if isinstance(batch, dict):
        if jax.process_count() == 1:
            return {k: jax.device_put(v, _sharding(k))
                    for k, v in batch.items()}
        return {
            k: jax.make_array_from_process_local_data(
                _sharding(k), np.asarray(v))
            for k, v in batch.items()
        }
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, default), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(default, np.asarray(x)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
