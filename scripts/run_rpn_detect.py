#!/usr/bin/env python
"""RCNN second-stage driver — counterpart of the reference's
run_rpn_detect.py (reference: nerf_rpn/run_rpn_detect.py:1-621): trains a
classification/refinement head over RPN proposals. Proposals come either
from a trained RPN checkpoint (--rpn_checkpoint, generated on the fly) or
from saved .npz proposal files (--roi_path, the reference's
RPNClassificationDataset flow)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

from common import add_common_flags, build_mesh, load_mae_params, overlap_batches, setup

import jax
import jax.numpy as jnp
import optax

from nerf_mae_tpu.config import SWIN_PRESETS, TrainConfig
from nerf_mae_tpu.data.datasets import (
    detection_batch_iterator,
    synthetic_detection_scenes,
)
from nerf_mae_tpu.eval.detection import detection_eval_summary
from nerf_mae_tpu.models.rcnn import RCNNConfig, RCNNStage
from nerf_mae_tpu.models.rpn import RPNConfig
from nerf_mae_tpu.parallel import make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.optim import make_optimizer
from nerf_mae_tpu.train.rpn_trainer import RPNTrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/eval the RCNN second stage")
    add_common_flags(p)
    p.add_argument("--boxes_path", default=None)
    p.add_argument("--roi_path", default=None,
                   help="dir of saved per-scene proposal .npz files")
    p.add_argument("--rpn_checkpoint", default=None,
                   help="trained RPN checkpoint to generate proposals")
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--rois_per_scene", default=128, type=int)
    p.add_argument("--proposals_per_scene", default=256, type=int)
    p.add_argument("--fg_threshold", default=0.5, type=float)
    p.add_argument("--bg_threshold", default=0.2, type=float)
    p.add_argument("--roi_output_size", default=5, type=int)
    p.add_argument("--max_gt", default=64, type=int)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    log = logging.getLogger("run_rpn_detect")

    swin = SWIN_PRESETS.get(args.backbone_type, SWIN_PRESETS["swin_s"])
    rpn_cfg = RPNConfig(
        resolution=args.resolution, rotated_bbox=args.rotated_bbox,
        pre_nms_top_n=args.proposals_per_scene,
        post_nms_top_n=args.proposals_per_scene, max_gt=args.max_gt,
    )
    rcnn_cfg = RCNNConfig(
        resolution=args.resolution,
        rois_per_scene=args.rois_per_scene,
        fg_threshold=args.fg_threshold,
        bg_threshold=args.bg_threshold,
        output_size=args.roi_output_size,
        rotated=args.rotated_bbox,
    )
    mesh = build_mesh(args, spatial_ok=False)

    # frozen first stage: backbone + RPN proposals
    rpn_trainer = RPNTrainer(
        swin, rpn_cfg, TrainConfig(batch_size=args.batch_size), 10, mesh,
        backbone=args.backbone_type, compute_dtype=args.compute_dtype,
        remat=not args.no_remat,
    )
    rpn_state = rpn_trainer.init(jax.random.PRNGKey(args.seed))
    if args.rpn_checkpoint:
        restored = restore_checkpoint(
            args.rpn_checkpoint,
            template={"params": rpn_state.params},
        )
        rpn_state = rpn_state.replace(params=restored["params"])
        log.info("restored RPN from %s", args.rpn_checkpoint)

    rcnn = RCNNStage(rcnn_cfg)

    # one jitted composite: backbone features + proposals + rcnn step
    @jax.jit
    def features_and_proposals(params, batch):
        feats = rpn_trainer.model.apply(
            {"params": params}, batch["grids"], True,
            method=lambda m, g, det: m.body(g, det),
        )
        det = rpn_trainer.model.apply(
            {"params": params}, batch["grids"], batch["sizes"],
            None, None, True, False, None,
        )
        return feats, det

    if args.dataset == "synthetic":
        scenes = synthetic_detection_scenes(
            args.n_synthetic, args.resolution, args.seed, obb=args.rotated_bbox
        )

        class _DS:
            def __len__(self):
                return len(scenes)

            def __getitem__(self, i):
                return scenes[i]

        train_ds = val_ds = _DS()
    else:
        from nerf_mae_tpu.data.datasets import SceneDataset, load_split

        split = load_split(args.dataset_split) if args.dataset_split else {}
        train_ds = SceneDataset(args.features_path, scene_list=split.get("train"),
                                boxes_path=args.boxes_path, dataset_type=args.dataset)
        val_ds = SceneDataset(args.features_path,
                              scene_list=split.get("val", split.get("test")),
                              boxes_path=args.boxes_path, dataset_type=args.dataset)

    total_steps = args.steps or max(len(train_ds) // args.batch_size, 1) * args.num_epochs
    tx = make_optimizer(
        TrainConfig(batch_size=args.batch_size, lr=args.lr,
                    weight_decay=args.weight_decay,
                    clip_grad_norm=args.clip_grad_norm),
        total_steps,
    )

    batches = overlap_batches(
        detection_batch_iterator(
            train_ds, args.batch_size, args.resolution, max_gt=args.max_gt,
            seed=args.seed, workers=args.workers,
        ),
        mesh, args.prefetch, transfer_dtype=args.transfer_dtype,
    )

    def obbify(boxes):
        # RCNNStage takes gt in its native form (6-dim AABB / 7-dim OBB)
        return jnp.asarray(boxes)

    # init rcnn on one real batch
    batch0 = next(batches)
    feats0, det0 = features_and_proposals(rpn_state.params, batch0)
    rng = jax.random.PRNGKey(args.seed)
    params = rcnn.init(
        {"params": rng}, feats0, det0["boxes"], det0["valid"],
        obbify(jnp.asarray(batch0["gt_boxes"])), jnp.asarray(batch0["gt_valid"]),
        rng, True,
    )["params"]
    opt_state = tx.init(params)
    log.info("initialized RCNNStage with %d params",
             sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)))

    @jax.jit
    def train_step(params, opt_state, feats, det, gt_boxes, gt_valid, rng):
        def loss_fn(p):
            return rcnn.apply(
                {"params": p}, feats, det["boxes"], det["valid"],
                gt_boxes, gt_valid, rng, True,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    @jax.jit
    def predict(params, feats, det):
        return rcnn.apply({"params": params}, feats, det["boxes"], det["valid"])

    def run_eval(params):
        it = detection_batch_iterator(
            val_ds, min(args.batch_size, len(val_ds)), args.resolution,
            max_gt=args.max_gt, shuffle=False, loop=False, drop_last=False,
        )
        props, scores, gts = [], [], []
        for batch in it:
            if batch["grids"].shape[0] % mesh.size:
                continue
            batch_s = shard_batch(batch, mesh)
            feats, det = features_and_proposals(rpn_state.params, batch_s)
            out = predict(params, feats, det)
            out = {k: np.asarray(v) for k, v in out.items()}
            for i in range(batch["grids"].shape[0]):
                keep = out["valid"][i]
                boxes = out["boxes"][i][keep]
                props.append(boxes)
                scores.append(out["scores"][i][keep])
                gts.append(batch["gt_boxes"][i][batch["gt_valid"][i]])
        if not props:
            return {}
        out = detection_eval_summary(props, scores, gts, top_n=(300,))
        log.info("eval: %s", json.dumps(out))
        return out

    if args.mode == "eval":
        out = run_eval(params)
        if args.eval_json:
            with open(args.eval_json, "w") as f:
                json.dump(out, f)
        return

    t0 = time.time()
    for step in range(1, total_steps + 1):
        batch = next(batches)
        feats, det = features_and_proposals(rpn_state.params, batch)
        params, opt_state, loss, aux = train_step(
            params, opt_state, feats, det,
            obbify(jnp.asarray(batch["gt_boxes"])), jnp.asarray(batch["gt_valid"]),
            jax.random.fold_in(rng, step),
        )
        if step % args.log_interval == 0:
            log.info(
                "step %d/%d loss %.4f (cls %.4f reg %.4f) pos %d %.1f grids/s",
                step, total_steps, float(loss), float(aux["loss_cls"]),
                float(aux["loss_reg"]), int(aux["num_pos"]),
                args.log_interval * args.batch_size / (time.time() - t0),
            )
            t0 = time.time()
        if step % args.ckpt_interval == 0 or step == total_steps:
            save_checkpoint(args.checkpoint_dir, step, params, opt_state)
    log.info("done")


if __name__ == "__main__":
    main()
