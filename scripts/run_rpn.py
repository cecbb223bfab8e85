#!/usr/bin/env python
"""Anchor-based RPN driver — counterpart of the reference's run_rpn.py
(reference: nerf_rpn/run_rpn.py:1-695). Same anchor config (sizes 8/16/32/64,
ratio permutations) and RPN hyperparameters."""

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
from nerf_mae_tpu.data.datasets import (
    SceneDataset,
    detection_batch_iterator,
    load_split,
    synthetic_detection_scenes,
)
from nerf_mae_tpu.eval.detection import detection_eval_summary
from nerf_mae_tpu.models.rpn import RPNConfig
from nerf_mae_tpu.parallel import make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.rpn_trainer import RPNTrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/eval the anchor-based NeRF RPN")
    add_common_flags(p)
    p.add_argument("--boxes_path", default=None)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--reg_loss_type", default="smooth_l1",
                   choices=["smooth_l1", "iou", "linear_iou"])
    p.add_argument("--rpn_head_conv_depth", default=2, type=int)
    p.add_argument("--rpn_pre_nms_top_n", default=2500, type=int)
    p.add_argument("--rpn_post_nms_top_n", default=2500, type=int)
    p.add_argument("--rpn_nms_thresh", default=0.3, type=float)
    p.add_argument("--rpn_fg_iou_thresh", default=0.35, type=float)
    p.add_argument("--rpn_bg_iou_thresh", default=0.2, type=float)
    p.add_argument("--rpn_batch_size_per_mesh", default=256, type=int)
    p.add_argument("--rpn_positive_fraction", default=0.5, type=float)
    p.add_argument("--rpn_score_thresh", default=0.0, type=float)
    p.add_argument("--max_gt", default=64, type=int)
    return p.parse_args(argv)


def build_datasets(args):
    if args.dataset == "synthetic":
        class _DS:
            def __init__(self, scenes):
                self.scenes = scenes

            def __len__(self):
                return len(self.scenes)

            def __getitem__(self, i):
                return self.scenes[i]

        # disjoint val draw (seed offset) so eval measures generalization —
        # same contract as run_fcos.build_datasets
        hard = getattr(args, "synthetic_hard", False)
        n_val = args.n_synthetic_val or max(args.n_synthetic // 4, 4)
        return (
            _DS(synthetic_detection_scenes(
                args.n_synthetic, args.resolution, args.seed,
                obb=args.rotated_bbox, hard=hard)),
            _DS(synthetic_detection_scenes(
                n_val, args.resolution, args.seed + 10_000,
                obb=args.rotated_bbox, hard=hard)),
        )
    split = load_split(args.dataset_split) if args.dataset_split else {}
    mk = lambda sl, aug: SceneDataset(
        args.features_path, scene_list=sl, boxes_path=args.boxes_path,
        dataset_type=args.dataset,
        flip_prob=args.flip_prob if aug else 0.0,
        rotate_prob=args.rotate_prob if aug else 0.0,
        rot_scale_prob=args.rot_scale_prob if aug else 0.0,
        percent_train=args.percent_train if aug else 1.0,
    )
    return mk(split.get("train"), True), mk(split.get("val", split.get("test")), False)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    log = logging.getLogger("run_rpn")

    swin = SWIN_PRESETS.get(args.backbone_type, SWIN_PRESETS["swin_s"])
    rpn = RPNConfig(
        resolution=args.resolution,
        rotated_bbox=args.rotated_bbox,
        reg_loss_type=args.reg_loss_type,
        conv_depth=args.rpn_head_conv_depth,
        fg_iou_thresh=args.rpn_fg_iou_thresh,
        bg_iou_thresh=args.rpn_bg_iou_thresh,
        batch_size_per_mesh=args.rpn_batch_size_per_mesh,
        positive_fraction=args.rpn_positive_fraction,
        pre_nms_top_n=args.rpn_pre_nms_top_n,
        post_nms_top_n=args.rpn_post_nms_top_n,
        nms_thresh=args.rpn_nms_thresh,
        score_thresh=args.rpn_score_thresh,
        max_gt=args.max_gt,
    )
    train_ds, val_ds = build_datasets(args)
    total_steps = args.steps or max(len(train_ds) // args.batch_size, 1) * args.num_epochs
    mesh = build_mesh(args, spatial_ok=False)
    trainer = RPNTrainer(
        swin, rpn,
        TrainConfig(batch_size=args.batch_size, lr=args.lr,
                    weight_decay=args.weight_decay,
                    clip_grad_norm=args.clip_grad_norm),
        total_steps, mesh,
        backbone=args.backbone_type, compute_dtype=args.compute_dtype,
        remat=not args.no_remat,
    )
    state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.mae_checkpoint:
        mae_cfg = MAEConfig(swin=swin, resolution=args.resolution)
        state = trainer.graft_mae_trunk(state, load_mae_params(args.mae_checkpoint, mae_cfg))
        log.info("grafted MAE trunk from %s", args.mae_checkpoint)
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

    batches = make_train_batches(
        args, mesh,
        lambda: detection_batch_iterator(
            train_ds, args.batch_size, args.resolution, max_gt=args.max_gt,
            seed=args.seed, workers=args.workers,
        ),
        corpus_iter_factory=lambda: detection_batch_iterator(
            train_ds, args.batch_size, args.resolution, max_gt=args.max_gt,
            shuffle=False, loop=False, drop_last=False, workers=args.workers,
        ),
    )

    def run_eval(state):
        it = detection_batch_iterator(
            val_ds, min(args.batch_size, len(val_ds)), args.resolution,
            max_gt=args.max_gt, shuffle=False, loop=False, drop_last=False,
        )
        props, scores, gts = [], [], []
        for batch in it:
            if batch["grids"].shape[0] % mesh.size:
                continue
            det = trainer.predict_step(state, shard_batch(batch, mesh))
            det = {k: np.asarray(v) for k, v in det.items()}
            for i in range(batch["grids"].shape[0]):
                keep = det["valid"][i]
                props.append(det["boxes"][i][keep])
                scores.append(det["scores"][i][keep])
                gts.append(batch["gt_boxes"][i][batch["gt_valid"][i]])
        if not props:
            return {}
        out = detection_eval_summary(props, scores, gts)
        log.info("eval: %s", json.dumps(out))
        return out

    if args.mode == "eval":
        out = run_eval(state)
        if args.eval_json:
            with open(args.eval_json, "w") as f:
                json.dump(out, f)
        return
    if args.mode == "benchmark":
        batch = next(batches)
        mean, std = benchmark_step(trainer.predict_step, state, batch,
                                    profile_dir=args.profile_dir)
        log.info("inference: %.2f ± %.2f ms", mean, std)
        return

    best = -1.0
    t0 = time.time()
    for step in range(1, total_steps + 1):
        state, m = trainer.train_step(state, next(batches))
        if step % args.log_interval == 0:
            mm = {k: float(v) for k, v in m.items()}
            log.info(
                "step %d/%d loss %.4f (obj %.4f reg %.4f) pos %d %.1f grids/s",
                step, total_steps, mm["loss"], mm["loss_objectness"],
                mm["loss_reg"], int(mm["num_pos"]),
                args.log_interval * args.batch_size / (time.time() - t0),
            )
            t0 = time.time()
        if step % args.eval_interval == 0 and len(val_ds):
            out = run_eval(state)
            if out.get("recall50_top2500", -1) > best:
                best = out["recall50_top2500"]
                save_checkpoint(args.checkpoint_dir, step, state.params,
                                state.opt_state, extra={"recall50": best})
        elif step % args.ckpt_interval == 0:
            save_checkpoint(args.checkpoint_dir, step, state.params, state.opt_state)
    save_checkpoint(args.checkpoint_dir, total_steps, state.params, state.opt_state)
    log.info("done")


if __name__ == "__main__":
    main()
