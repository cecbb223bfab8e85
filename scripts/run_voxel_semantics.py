#!/usr/bin/env python
"""Voxel semantic segmentation driver (19/21 classes) — counterpart of the
reference's run_voxel_semantics.py (reference: nerf_rpn/
run_voxel_semantics.py:1-1063): weighted masked CE training, mIoU/mAcc/
allAcc eval via confusion counts."""

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
from nerf_mae_tpu.models.heads import intersection_and_union
from nerf_mae_tpu.parallel import grid_pspec, make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.head_trainer import VoxelSemanticsTrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="NeRF voxel semantic segmentation")
    add_common_flags(p)
    p.add_argument("--sem_feat_path", default=None)
    p.add_argument("--num_classes", default=19, type=int,
                   help="19 for Front3D, 21 for HM3D")
    p.add_argument("--class_weights", default=None,
                   help="npy file of per-class CE weights")
    return p.parse_args(argv)


def batch_iter(ds, args, shuffle=True, loop=True):
    rng = np.random.RandomState(args.seed)
    n = len(ds)
    bs = min(args.batch_size, n)
    r = args.resolution
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n - bs + 1, bs):
            sel = order[s : s + bs]
            grids = np.zeros((bs, r, r, r, 4), np.float32)
            sems = np.zeros((bs, r, r, r), np.int32)
            for i, j in enumerate(sel):
                item = ds[int(j)]
                grids[i], _ = pad_to_cube(item["rgbsigma"], r)
                sem = item["semantics"]
                sem = sem[:r, :r, :r]
                sems[i, : sem.shape[0], : sem.shape[1], : sem.shape[2]] = sem
            yield {"grids": grids, "semantics": sems}
        if not loop:
            return


def build_datasets(args):
    if args.dataset == "synthetic":
        def mk(n, seed):
            # blob scenes whose semantic label is learnable from the grid:
            # each blob's class determines its color band (class 0 = empty)
            rs = np.random.RandomState(seed)
            r = args.resolution
            scenes = []
            for _ in range(n):
                g = np.zeros((r, r, r, 4), np.float32)
                sem = np.zeros((r, r, r), np.int32)
                for _ in range(rs.randint(4, 9)):
                    cls = rs.randint(1, args.num_classes)
                    c = rs.randint(4, r - 4, 3)
                    e = rs.randint(3, max(r // 5, 4), 3)
                    s0, s1 = np.maximum(c - e, 0), np.minimum(c + e, r)
                    sl = (slice(s0[0], s1[0]), slice(s0[1], s1[1]),
                          slice(s0[2], s1[2]))
                    base = (cls - 1) / max(args.num_classes - 1, 1)
                    g[sl + (slice(0, 3),)] = np.clip(
                        base + rs.randn(3) * 0.05, 0, 1)
                    g[sl + (3,)] = rs.uniform(0.5, 1.0)
                    sem[sl] = cls
                scenes.append({"rgbsigma": g, "semantics": sem})
            return scenes

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
        args.features_path, scene_list=sl, sem_feat_path=args.sem_feat_path,
        dataset_type=args.dataset,
    )
    return mk(split.get("train")), mk(split.get("val", split.get("test")))


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    log = logging.getLogger("run_voxel_semantics")

    swin = SWIN_PRESETS.get(args.backbone_type, SWIN_PRESETS["swin_s"])
    mae_cfg = MAEConfig(
        swin=swin, resolution=args.resolution,
        compute_dtype=args.compute_dtype, remat=not args.no_remat,
    )
    weights = np.load(args.class_weights) if args.class_weights else None
    train_ds, val_ds = build_datasets(args)
    total_steps = args.steps or max(len(train_ds) // args.batch_size, 1) * args.num_epochs
    mesh = build_mesh(args)
    trainer = VoxelSemanticsTrainer(
        mae_cfg,
        TrainConfig(batch_size=args.batch_size, lr=args.lr,
                    weight_decay=args.weight_decay,
                    clip_grad_norm=args.clip_grad_norm),
        total_steps, mesh, num_classes=args.num_classes, class_weights=weights,
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
        inter = np.zeros(args.num_classes)
        union = np.zeros(args.num_classes)
        tgt = np.zeros(args.num_classes)
        losses = []
        for batch in batch_iter(val_ds, args, shuffle=False, loop=False):
            if batch["grids"].shape[0] % mesh.shape["data"]:
                continue
            gp = grid_pspec(mesh)
            specs = {k: gp for k, v in batch.items()
                     if getattr(v, "ndim", 0) >= 4}
            m = trainer.eval_step(
                state, shard_batch(batch, mesh, specs=specs))
            losses.append(float(m["loss"]))
            i, u, t = intersection_and_union(
                np.asarray(m["pred_labels"]), batch["semantics"], args.num_classes
            )
            inter += i
            union += u
            tgt += t
        if not losses:
            return {}
        present = tgt > 0
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        acc = np.where(tgt > 0, inter / np.maximum(tgt, 1), 0.0)
        out = {
            "loss": float(np.mean(losses)),
            "mIoU": float(iou[present].mean()) if present.any() else 0.0,
            "mAcc": float(acc[present].mean()) if present.any() else 0.0,
            "allAcc": float(inter.sum() / max(tgt.sum(), 1)),
        }
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
            log.info("step %d/%d loss %.4f soft_miou %.3f %.1f grids/s",
                     step, total_steps, mm["loss"], mm["soft_miou"],
                     args.log_interval * args.batch_size / (time.time() - t0))
            t0 = time.time()
        if step % args.eval_interval == 0 and len(val_ds):
            out = run_eval(state)
            if out.get("mIoU", -1) > best:
                best = out["mIoU"]
                save_checkpoint(args.checkpoint_dir, step, state.params,
                                state.opt_state, extra={"mIoU": best})
        elif step % args.ckpt_interval == 0:
            save_checkpoint(args.checkpoint_dir, step, state.params, state.opt_state)
    save_checkpoint(args.checkpoint_dir, total_steps, state.params, state.opt_state)
    log.info("done")


if __name__ == "__main__":
    main()
