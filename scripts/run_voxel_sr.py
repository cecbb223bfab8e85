#!/usr/bin/env python
"""Voxel super-resolution driver (160^3 -> 256^3/384^3) — counterpart of the
reference's run_voxelSR.py (reference: nerf_rpn/run_voxelSR.py:1-890).
Pass --mae_checkpoint to use the pretrained trunk (the "_Pretrained_Skip"
variant)."""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

from common import (add_common_flags, build_mesh, benchmark_step, load_mae_params,
                    make_train_batches, setup)

import jax

from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS, TrainConfig
from nerf_mae_tpu.data.datasets import SceneDataset, load_split, pad_to_cube
from nerf_mae_tpu.parallel import grid_pspec, make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.head_trainer import VoxelSRTrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="NeRF voxel super-resolution")
    add_common_flags(p)
    p.add_argument("--out_feat_path", default=None)
    p.add_argument("--out_resolution", default=256, type=int,
                   help="output grid edge (reference uses 256 or 384 from "
                        "160^3 input; any multiple of the input works)")
    return p.parse_args(argv)


def batch_iter(ds, args, shuffle=True, loop=True):
    rng = np.random.RandomState(args.seed)
    n = len(ds)
    bs = min(args.batch_size, n)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n - bs + 1, bs):
            sel = order[s : s + bs]
            grids = np.zeros((bs, args.resolution, args.resolution, args.resolution, 4), np.float32)
            outs = np.zeros((bs, args.out_resolution, args.out_resolution, args.out_resolution, 4), np.float32)
            for i, j in enumerate(sel):
                item = ds[int(j)]
                grids[i], _ = pad_to_cube(item["rgbsigma"], args.resolution)
                outs[i], _ = pad_to_cube(item["out_rgbsigma"], args.out_resolution)
            yield {"grids": grids, "out_grids": outs}
        if not loop:
            return


def build_datasets(args):
    if args.dataset == "synthetic":
        from nerf_mae_tpu.data.datasets import synthetic_scenes

        def mk(n, seed):
            # structured blob scenes at full output resolution; low-res
            # input = strided subsample (learnable SR, unlike iid noise)
            his = synthetic_scenes(n, args.out_resolution, seed,
                                   min_size=args.out_resolution)
            f = args.out_resolution / args.resolution
            idx = (np.arange(args.resolution) * f).astype(int)
            return [
                {"rgbsigma": hi[idx][:, idx][:, :, idx], "out_rgbsigma": hi}
                for hi in his
            ]

        class _DS:
            def __init__(self, scenes):
                self.scenes = scenes

            def __len__(self):
                return len(self.scenes)

            def __getitem__(self, i):
                return self.scenes[i]

        n_val = args.n_synthetic_val or max(args.n_synthetic // 4, 2)
        return (_DS(mk(args.n_synthetic, args.seed)),
                _DS(mk(n_val, args.seed + 10_000)))
    split = load_split(args.dataset_split) if args.dataset_split else {}
    mk = lambda sl: SceneDataset(
        args.features_path, scene_list=sl, out_feat_path=args.out_feat_path,
        dataset_type=args.dataset,
    )
    return mk(split.get("train")), mk(split.get("val", split.get("test")))


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    log = logging.getLogger("run_voxel_sr")

    swin = SWIN_PRESETS.get(args.backbone_type, SWIN_PRESETS["swin_s"])
    mae_cfg = MAEConfig(
        swin=swin, resolution=args.resolution,
        compute_dtype=args.compute_dtype, remat=not args.no_remat,
    )
    train_ds, val_ds = build_datasets(args)
    total_steps = args.steps or max(len(train_ds) // args.batch_size, 1) * args.num_epochs
    mesh = build_mesh(args)
    trainer = VoxelSRTrainer(
        mae_cfg,
        TrainConfig(batch_size=args.batch_size, lr=args.lr,
                    weight_decay=args.weight_decay,
                    clip_grad_norm=args.clip_grad_norm),
        total_steps, mesh, out_resolution=args.out_resolution,
    )
    state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.mae_checkpoint:
        state = trainer.graft_mae(state, load_mae_params(args.mae_checkpoint, mae_cfg))
        log.info("grafted MAE trunk+decoder from %s", args.mae_checkpoint)
    if args.checkpoint:
        # opt_state only matters when resuming training; eval/benchmark
        # restore params alone so checkpoints from older optimizer layouts
        # keep loading
        tmpl = {"params": state.params}
        if args.mode == "train":
            tmpl["opt_state"] = state.opt_state
        restored = restore_checkpoint(args.checkpoint, template=tmpl)
        state = state.replace(params=restored["params"])
        if args.mode == "train":
            state = state.replace(opt_state=restored["opt_state"])

    # corpus pass at batch_size=1 so the device cache holds every scene
    # (batch_iter always drops ragged tails)
    one = argparse.Namespace(**{**vars(args), "batch_size": 1})
    batches = make_train_batches(
        args, mesh,
        lambda: batch_iter(train_ds, args),
        corpus_iter_factory=lambda: batch_iter(
            train_ds, one, shuffle=False, loop=False),
    )

    def run_eval(state):
        ms = []
        for batch in batch_iter(val_ds, args, shuffle=False, loop=False):
            if batch["grids"].shape[0] % mesh.shape["data"]:
                continue
            gp = grid_pspec(mesh)
            specs = {k: gp for k, v in batch.items()
                     if getattr(v, "ndim", 0) >= 4}
            m = trainer.eval_step(
                state, shard_batch(batch, mesh, specs=specs))
            ms.append({k: float(v) for k, v in m.items()})
        if not ms:
            return {}
        out = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        log.info("eval: %s", out)
        return out

    if args.mode == "eval":
        out = run_eval(state)
        if args.eval_json:
            with open(args.eval_json, "w") as f:
                json.dump(out, f)
        return
    if args.mode == "benchmark":
        batch = next(batches)
        mean, std = benchmark_step(trainer.eval_step, state, batch,
                                    profile_dir=args.profile_dir)
        log.info("inference: %.2f ± %.2f ms", mean, std)
        return

    best = -1.0
    t0 = time.time()
    for step in range(1, total_steps + 1):
        state, m = trainer.train_step(state, next(batches))
        if step % args.log_interval == 0:
            mm = {k: float(v) for k, v in m.items()}
            log.info("step %d/%d loss %.5f psnr %.2f %.1f grids/s",
                     step, total_steps, mm["loss"], mm["psnr"],
                     args.log_interval * args.batch_size / (time.time() - t0))
            t0 = time.time()
        if step % args.eval_interval == 0 and len(val_ds):
            out = run_eval(state)
            if out.get("psnr", -1) > best:
                best = out["psnr"]
                save_checkpoint(args.checkpoint_dir, step, state.params,
                                state.opt_state, extra={"psnr": best})
        elif step % args.ckpt_interval == 0:
            save_checkpoint(args.checkpoint_dir, step, state.params, state.opt_state)
    save_checkpoint(args.checkpoint_dir, total_steps, state.params, state.opt_state)
    log.info("done")


if __name__ == "__main__":
    main()
