#!/usr/bin/env python
"""FCOS 3D detection driver — TPU-native counterpart of the reference's
run_fcos.py / run_fcos_pretrained.py (reference: nerf_rpn/
run_fcos_pretrained.py:41-1114). Same flag names; pass --mae_checkpoint to
graft a pretrained MAE trunk (the "_pretrained" variant), omit it to train
from scratch.

Example:
  python scripts/run_fcos.py --mode train --dataset synthetic --platform cpu \
      --backbone_type swin_s --resolution 160 --rotated_bbox ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os
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
from nerf_mae_tpu.models.fcos import FCOSConfig
from nerf_mae_tpu.parallel import make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.det_trainer import DetectionTrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/eval 3D FCOS over NeRF grids")
    add_common_flags(p)
    p.add_argument("--boxes_path", default=None)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--num_convs", default=4, type=int)
    p.add_argument("--iou_loss_type", default="iou",
                   choices=["iou", "linear_iou", "giou", "diou", "smooth_l1"])
    p.add_argument("--center_sampling_radius", default=1.5, type=float)
    p.add_argument("--use_additional_l1_loss", action="store_true")
    p.add_argument("--pre_nms_top_n", default=2500, type=int)
    p.add_argument("--fpn_post_nms_top_n", default=2500, type=int)
    p.add_argument("--nms_thresh", default=0.3, type=float)
    p.add_argument("--pre_nms_thresh", default=0.0, type=float)
    p.add_argument("--min_size", default=0.0, type=float)
    p.add_argument("--max_gt", default=64, type=int)
    p.add_argument("--out_channels", default=256, type=int)
    p.add_argument("--output_proposals", default=None,
                   help="eval mode: write per-scene npz (boxes, scores, "
                        "gt_boxes) here for scripts/visualize_detections.py "
                        "(reference: run_fcos_pretrained.py --save_results)")
    p.add_argument("--output_voxel_scores", default=None,
                   help="dir for per-voxel objectness npz dumps during eval "
                        "(reference: fcos/fcos.py:322 output_objectness)")
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

        # disjoint val draw (seed offset) so eval measures generalization
        hard = getattr(args, "synthetic_hard", False)
        n_val = args.n_synthetic_val or max(args.n_synthetic // 4, 4)
        return (
            _DS(synthetic_detection_scenes(
                args.n_synthetic, args.resolution, args.seed,
                obb=args.rotated_bbox, hard=hard)),
            _DS(synthetic_detection_scenes(
                n_val, args.resolution,
                args.seed + 10_000, obb=args.rotated_bbox, hard=hard)),
        )
    split = load_split(args.dataset_split) if args.dataset_split else {}
    mk = lambda scene_list, aug: SceneDataset(
        args.features_path,
        scene_list=scene_list,
        boxes_path=args.boxes_path,
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
    log = logging.getLogger("run_fcos")

    swin = SWIN_PRESETS.get(args.backbone_type, SWIN_PRESETS["swin_s"])
    fcos = FCOSConfig(
        resolution=args.resolution,
        use_obb=args.rotated_bbox,
        num_convs=args.num_convs,
        iou_loss_type=args.iou_loss_type,
        center_sampling_radius=args.center_sampling_radius,
        use_additional_l1_loss=args.use_additional_l1_loss,
        pre_nms_thresh=args.pre_nms_thresh,
        pre_nms_top_n=args.pre_nms_top_n,
        nms_thresh=args.nms_thresh,
        post_nms_top_n=args.fpn_post_nms_top_n,
        min_size=args.min_size,
        max_gt=args.max_gt,
    )
    train_ds, val_ds = build_datasets(args)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    total_steps = args.steps or steps_per_epoch * args.num_epochs
    mesh = build_mesh(args, spatial_ok=False)
    trainer = DetectionTrainer(
        swin, fcos,
        TrainConfig(batch_size=args.batch_size, lr=args.lr,
                    weight_decay=args.weight_decay,
                    clip_grad_norm=args.clip_grad_norm, seed=args.seed),
        total_steps, mesh,
        backbone=args.backbone_type,
        compute_dtype=args.compute_dtype,
        remat=not args.no_remat,
        output_objectness=args.output_voxel_scores is not None,
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
        log.info("restored checkpoint from %s", args.checkpoint)

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
            if args.output_voxel_scores:
                os.makedirs(args.output_voxel_scores, exist_ok=True)
                for i in range(batch["grids"].shape[0]):
                    dump = {}
                    for lvl, s in enumerate(fcos.strides):
                        ob = det[f"objectness_level{lvl}"][i]
                        lim = np.ceil(batch["sizes"][i] / s).astype(int)
                        dump[str(lvl)] = ob[: lim[0], : lim[1], : lim[2]]
                    np.savez_compressed(
                        os.path.join(args.output_voxel_scores,
                                     f"scene_{len(props) + i}.npz"),
                        **dump,
                    )
            for i in range(batch["grids"].shape[0]):
                keep = det["valid"][i]
                boxes = det["boxes"][i][keep]
                if not args.rotated_bbox:  # report AABBs
                    boxes = np.concatenate(
                        [boxes[:, :3] - boxes[:, 3:6] / 2,
                         boxes[:, :3] + boxes[:, 3:6] / 2], axis=1,
                    )
                props.append(boxes)
                scores.append(det["scores"][i][keep])
                gts.append(batch["gt_boxes"][i][batch["gt_valid"][i]])
                if args.output_proposals:
                    os.makedirs(args.output_proposals, exist_ok=True)
                    np.savez_compressed(
                        os.path.join(args.output_proposals,
                                     f"scene_{len(props) - 1}.npz"),
                        boxes=props[-1], scores=scores[-1], gt_boxes=gts[-1],
                        grid=batch["grids"][i],
                        size=batch["sizes"][i],
                    )
        if not props:
            return {}
        out = detection_eval_summary(props, scores, gts)
        log.info("eval: %s", json.dumps(out, indent=None))
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
        log.info("inference: %.2f ± %.2f ms (batch %d)", mean, std, args.batch_size)
        return

    best_ap = -1.0
    t0 = time.time()
    for step in range(1, total_steps + 1):
        batch = next(batches)
        state, m = trainer.train_step(state, batch)
        if step % args.log_interval == 0:
            mm = {k: float(v) for k, v in m.items()}
            rate = args.log_interval * args.batch_size / (time.time() - t0)
            log.info(
                "step %d/%d loss %.4f (cls %.4f reg %.4f ctr %.4f) pos %d %.1f grids/s",
                step, total_steps, mm["loss"], mm["loss_cls"], mm["loss_reg"],
                mm["loss_centerness"], int(mm["num_pos"]), rate,
            )
            t0 = time.time()
        if step % args.eval_interval == 0 and len(val_ds):
            out = run_eval(state)
            ap50 = out.get("ap50", -1)
            if ap50 > best_ap:
                best_ap = ap50
                save_checkpoint(args.checkpoint_dir, step, state.params,
                                state.opt_state, extra={"ap50": ap50})
                log.info("saved best-AP50 ckpt (%.4f) at step %d", ap50, step)
        elif step % args.ckpt_interval == 0:
            save_checkpoint(args.checkpoint_dir, step, state.params, state.opt_state)
    save_checkpoint(args.checkpoint_dir, total_steps, state.params, state.opt_state)
    log.info("done: %d steps", total_steps)


if __name__ == "__main__":
    main()
