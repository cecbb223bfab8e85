#!/usr/bin/env python
"""Same-host CPU throughput comparison: reference PyTorch MAE train step vs
our JAX train step, identical model config and batch.

BASELINE.md's A100 grids/s row is an estimate (the reference's CUDA path is
unrunnable here); this script provides the one comparison that IS runnable
on this machine — both frameworks on the same CPU cores, same model
(Swin-MAE3D v2 swin_s, reference swin_mae3d.py:1601-1624), same step
semantics (forward + MAE loss + backward + AdamW update, reference
run_swin_mae3d.py:644-709). It does not validate absolute TPU-vs-A100
numbers, but it pins the *framework* overhead ratio on shared hardware.

The reference model is imported from /root/reference (not copied), with the
same torchvision shims the golden-fixture generator uses
(scripts/make_golden_fixtures.py).

Usage: python scripts/bench_reference_torch.py [--resolution 64]
       [--batch_size 1] [--steps 3] [--which both|torch|jax]
Emits one JSON line per framework plus a final comparison line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SWIN_S = dict(embed_dim=96, depths=[2, 2, 18, 2], num_heads=[3, 6, 12, 24])


def bench_torch(args) -> dict:
    import torch
    from make_golden_fixtures import _install_torchvision_shims

    _install_torchvision_shims()
    if not hasattr(np, "float"):
        np.float = float  # numpy<1.24 alias used by ref torch_utils.py:42
    sys.path.insert(0, "/root/reference")
    from nerf_mae.model.mae.swin_mae3d import SwinTransformer_MAE3D_New

    torch.manual_seed(0)
    model = SwinTransformer_MAE3D_New(
        patch_size=[4, 4, 4], window_size=[4, 4, 4],
        stochastic_depth_prob=0.1, masking_prob=0.75,
        resolution=args.resolution, **SWIN_S,
    )
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-3)
    rs = np.random.RandomState(1)
    r = args.resolution
    grids = [torch.tensor(rs.rand(4, r, r, r).astype(np.float32))
             for _ in range(args.batch_size)]

    def step():
        loss = model(grids)[0]
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(args.warmup):
        step()
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        loss = step()
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    out = {
        "framework": f"torch-{torch.__version__}", "step_ms": round(ms, 1),
        "grids_per_s": round(args.batch_size / (ms / 1e3), 4),
        "loss": round(loss, 4),
    }
    print(json.dumps(out), flush=True)
    return out


def bench_jax(args) -> dict:
    # CPU pin must happen before first device use (see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nerf_mae_tpu.config import MAEConfig, SwinConfig, TrainConfig
    from nerf_mae_tpu.train.trainer import MAETrainer

    cfg = MAEConfig(
        swin=SwinConfig(
            embed_dim=SWIN_S["embed_dim"],
            depths=tuple(SWIN_S["depths"]),
            num_heads=tuple(SWIN_S["num_heads"]),
        ),
        resolution=args.resolution, masking_prob=0.75,
        compute_dtype="float32",  # fair CPU comparison: ref trains fp32
        remat=False,
    )
    trainer = MAETrainer(cfg, TrainConfig(batch_size=args.batch_size),
                         total_steps=1000)
    state = trainer.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    r = args.resolution
    batch = {
        "grids": rs.rand(args.batch_size, r, r, r, 4).astype(np.float32),
        "sizes": np.full((args.batch_size, 3), r, np.int32),
    }

    for _ in range(max(args.warmup, 1)):  # >=1: compile outside the timing
        state, metrics = trainer.train_step(state, batch)
    jax.block_until_ready(metrics)
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, batch)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    out = {
        "framework": f"jax-{jax.__version__}", "step_ms": round(ms, 1),
        "grids_per_s": round(args.batch_size / (ms / 1e3), 4),
        "loss": round(float(metrics["loss"]), 4),
    }
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--which", choices=["both", "torch", "jax"],
                   default="both")
    args = p.parse_args(argv)

    results = {}
    if args.which in ("both", "torch"):
        results["torch"] = bench_torch(args)
    if args.which in ("both", "jax"):
        results["jax"] = bench_jax(args)
    if len(results) == 2:
        ratio = results["torch"]["step_ms"] / results["jax"]["step_ms"]
        print(json.dumps({
            "metric": "same_host_cpu_step_ratio_torch_over_jax",
            "value": round(ratio, 3),
            "resolution": args.resolution,
            "batch_size": args.batch_size,
            "torch_step_ms": results["torch"]["step_ms"],
            "jax_step_ms": results["jax"]["step_ms"],
        }), flush=True)


if __name__ == "__main__":
    main()
