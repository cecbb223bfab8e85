"""Shared driver infrastructure (arg groups, logging, platform override,
checkpoint plumbing) for the task CLIs."""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def setup(args):
    if getattr(args, "platform", None):
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    enable_compilation_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        force=True,  # the env's sitecustomize pre-installs root handlers
    )
    for noisy in ("absl", "orbax", "jax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def enable_compilation_cache():
    """Persistent XLA compilation cache: a driver restarted with the same
    model/shape skips the multi-minute TPU compile (the torch reference has
    no analogue; on TPU this is the difference between a 20-minute and a
    20-second warm start). Opt out with NERF_MAE_NO_COMP_CACHE=1."""
    if os.environ.get("NERF_MAE_NO_COMP_CACHE") == "1":
        return
    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/nerf_mae_tpu/xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # cache is best-effort; never block a run on it
        pass


import contextlib


@contextlib.contextmanager
def maybe_profile(profile_dir):
    """jax.profiler trace around the wrapped steps when profile_dir is set
    (view with tensorboard / xprof). The TPU-side stand-in for the
    reference's CUDA-event benchmark harness
    (reference: nerf_rpn/run_fcos_pretrained.py:989-1014)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.getLogger("profile").info("trace written to %s", profile_dir)


def add_common_flags(p):
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the benchmark steps "
                        "(or the first --log_interval train steps) here")
    p.add_argument("--backbone_type", default="swin_s")
    p.add_argument("--resolution", default=160, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--num_epochs", default=100, type=int)
    p.add_argument("--steps", default=None, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight_decay", default=1e-3, type=float)
    p.add_argument("--clip_grad_norm", default=0.1, type=float)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--checkpoint_dir", default="checkpoints/task")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mae_checkpoint", default=None,
                   help="pretrained MAE checkpoint dir to graft the trunk from")
    p.add_argument("--log_interval", default=10, type=int)
    p.add_argument("--eval_interval", default=200, type=int)
    p.add_argument("--ckpt_interval", default=500, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--eval_json", default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--dataset", default="front3d",
                   choices=["front3d", "hypersim", "scannet", "synthetic"])
    p.add_argument("--features_path", default=None)
    p.add_argument("--dataset_split", default=None)
    p.add_argument("--percent_train", default=1.0, type=float)
    p.add_argument("--flip_prob", default=0.0, type=float)
    p.add_argument("--rotate_prob", default=0.0, type=float)
    p.add_argument("--rot_scale_prob", default=0.0, type=float)
    p.add_argument("--n_synthetic", default=16, type=int)
    p.add_argument("--n_synthetic_val", default=0, type=int,
                   help="held-out synthetic eval scenes (0: n_synthetic/4)")
    p.add_argument("--synthetic_hard", action="store_true",
                   help="harder synthetic distribution: clutter slabs/"
                        "debris, smaller+fainter objects, alpha noise — "
                        "the low-data e2e regime")
    p.add_argument("--workers", default=max((os.cpu_count() or 1) - 1, 0),
                   type=int, help="batch-assembly threads (0 = inline)")
    p.add_argument("--prefetch", default=2, type=int,
                   help="batches kept ready on a background thread "
                        "(0 = synchronous)")
    p.add_argument("--transfer_dtype", default="float32",
                   choices=["float32", "bfloat16", "float16"],
                   help="downcast float batch arrays on the host before "
                        "the device transfer (halves host->device bytes)")
    p.add_argument("--device_data", action="store_true",
                   help="upload the whole (fixed) training corpus to HBM "
                        "once and serve batches as on-device gathers — "
                        "removes per-step host->device grid transfers "
                        "(needs corpus to fit HBM; excludes host "
                        "augmentation)")
    p.add_argument("--mesh_space", default=1, type=int,
                   help="shard the voxel grid's first spatial dim over this "
                        "many devices ([data, space] mesh — lifts the "
                        "one-chip HBM ceiling; MAE/SR/semantics trainers)")
    return p


def build_mesh(args, spatial_ok: bool = True):
    """Driver mesh: 1-D data mesh, or [data, space] when --mesh_space > 1
    (parallel.make_mesh_2d; data size = n_devices // mesh_space)."""
    from nerf_mae_tpu.parallel import make_mesh, make_mesh_2d

    n_space = getattr(args, "mesh_space", 1) or 1
    if n_space <= 1:
        return make_mesh()
    if not spatial_ok:
        raise SystemExit(
            "--mesh_space > 1 is only supported by the MAE/SR/semantics "
            "trainers (detection trainers are data-parallel only)")
    return make_mesh_2d(None, n_space)


def overlap_batches(batches, mesh, depth: int, transfer_dtype: str = None):
    """Wrap a numpy batch iterator so assembly + device_put of batch N+1
    overlap the device step on batch N (reference analogue: DataLoader
    worker processes, nerf_mae/run_swin_mae3d.py:578-586)."""
    from nerf_mae_tpu.data.pipeline import prefetch
    from nerf_mae_tpu.parallel import grid_pspec, shard_batch
    from nerf_mae_tpu.parallel.mesh import is_spatial

    def put(b):
        # on a [data, space] mesh the grid-like tensors (ndim >= 4:
        # grids/out_grids/semantics) shard their first spatial dim too
        specs = None
        if is_spatial(mesh) and isinstance(b, dict):
            gp = grid_pspec(mesh)
            specs = {k: gp for k, v in b.items()
                     if getattr(v, "ndim", 0) >= 4}
        return shard_batch(b, mesh, transfer_dtype=transfer_dtype,
                           specs=specs)

    if depth > 0:
        return prefetch(batches, depth=depth, map_fn=put)
    return (put(b) for b in batches)


def make_train_batches(args, mesh, host_iter_factory, corpus_iter_factory=None):
    """Build the training batch stream for a driver.

    Default: host batch iterator wrapped in the prefetch/device_put overlap
    pipeline (overlap_batches). Under --device_data: drain
    `corpus_iter_factory()` once (an iterator covering every scene exactly
    once), upload the corpus to HBM, and serve jitted on-device gathers
    (data.device_cache) — per-step host->device traffic collapses to a [B]
    int32 index vector. The reference re-reads .npz scenes from disk every
    epoch (reference: nerf_rpn/datasets.py:88-101); on TPU hosts with a slow
    device link the one-time upload is the difference between
    transfer-bound and compute-bound training.
    """
    if not getattr(args, "device_data", False):
        return overlap_batches(host_iter_factory(), mesh, args.prefetch,
                               transfer_dtype=args.transfer_dtype)
    aug = [f for f in ("flip_prob", "rotate_prob", "rot_scale_prob")
           if getattr(args, f, 0.0)]
    if aug:
        raise SystemExit(
            "--device_data caches a fixed corpus once; per-epoch host "
            "augmentation is incompatible (drop "
            + ", ".join(f"--{a}" for a in aug) + ")")
    # --patch_major_input composes: the corpus iterator emits patch-major
    # [N,T,T,T,p^3,4] leaves, the cache stores and gathers them channel-
    # flat (the TPU-preferred argument layout, device_cache module doc;
    # first spatial dim is still axis 1, so the [data, space] store/serve
    # specs apply unchanged).
    from nerf_mae_tpu.data.device_cache import (corpus_from_iterator,
                                                device_corpus_batches)
    corpus = corpus_from_iterator(
        (corpus_iter_factory or host_iter_factory)())
    return device_corpus_batches(
        corpus, mesh, args.batch_size, seed=args.seed,
        transfer_dtype=args.transfer_dtype)


def load_mae_params(mae_checkpoint_dir: str, mae_cfg):
    """Restore pretrained MAE params (fp32 pytree) for grafting."""
    import jax.numpy as jnp

    from nerf_mae_tpu.models.mae import SwinMAE3D
    from nerf_mae_tpu.train.checkpoint import restore_checkpoint

    model = SwinMAE3D(mae_cfg)
    rng = jax.random.PRNGKey(0)
    r = mae_cfg.resolution
    template = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "mask": rng}, jnp.zeros((1, r, r, r, 4)), True
        )["params"]
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    restored = restore_checkpoint(mae_checkpoint_dir, template={"params": template})
    return restored["params"]


def benchmark_step(step_fn, state, batch, reps: int = 20, warmup: int = 3,
                   profile_dir=None):
    """Latency harness (reference: run_fcos_pretrained.py:989-1014 uses CUDA
    events; here block_until_ready timing). profile_dir captures a
    jax.profiler trace of the timed reps."""
    import time

    for _ in range(warmup):
        out = step_fn(state, batch)
    jax.block_until_ready(out)
    times = []
    with maybe_profile(profile_dir):
        for _ in range(reps):
            t = time.perf_counter()
            out = step_fn(state, batch)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t)
    times = np.asarray(times) * 1000
    return float(times.mean()), float(times.std())
