#!/usr/bin/env python
"""MAE pretraining driver — TPU-native counterpart of the reference's
run_swin_mae3d.py CLI (reference: nerf_mae/run_swin_mae3d.py:41-906,
train_mae3d.sh). Same flag names where sensible; --mode {train,eval,benchmark}.

Examples:
  python scripts/run_mae_pretrain.py --mode train --dataset synthetic \
      --backbone_type swin_s --resolution 160 --batch_size 8 --steps 100
  python scripts/run_mae_pretrain.py --mode train \
      --features_path /data/front3d/features --dataset_split split.npz ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS, SwinConfig, TrainConfig
from nerf_mae_tpu.data import (
    SceneDataset,
    load_split,
    mae_batch_iterator,
    synthetic_scenes,
)
from nerf_mae_tpu.parallel import make_mesh, shard_batch
from nerf_mae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from nerf_mae_tpu.train.trainer import MAETrainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/eval NeRF-MAE on TPU")
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--dataset", default="front3d",
                   choices=["front3d", "hypersim", "scannet", "synthetic"])
    p.add_argument("--features_path", default=None)
    p.add_argument("--dataset_split", default=None)
    p.add_argument("--backbone_type", default="swin_s", choices=list(SWIN_PRESETS))
    p.add_argument("--resolution", default=160, type=int)
    p.add_argument("--masking_prob", default=0.75, type=float)
    p.add_argument("--masking_strategy", default="random", choices=["random", "grid"])
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_epochs", default=2000, type=int)
    p.add_argument("--steps", default=None, type=int,
                   help="total train steps (overrides num_epochs)")
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight_decay", default=1e-3, type=float)
    p.add_argument("--clip_grad_norm", default=0.1, type=float)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--flip_prob", default=0.0, type=float)
    p.add_argument("--rotate_prob", default=0.0, type=float)
    p.add_argument("--percent_train", default=1.0, type=float)
    p.add_argument("--checkpoint_dir", default="checkpoints/mae")
    p.add_argument("--checkpoint", default=None, help="resume/eval checkpoint dir")
    p.add_argument("--log_interval", default=10, type=int)
    p.add_argument("--eval_interval", default=200, type=int,
                   help="steps between eval passes")
    p.add_argument("--ckpt_interval", default=500, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--n_synthetic", default=16, type=int)
    p.add_argument("--n_synthetic_val", default=0, type=int,
                   help="held-out synthetic eval scenes (0: n_synthetic/4)")
    p.add_argument("--synthetic_hard", action="store_true",
                   help="harder synthetic distribution (matches run_fcos "
                        "--synthetic_hard for e2e pretrain->finetune)")
    p.add_argument("--eval_json", default=None, help="dump eval metrics to json")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of benchmark steps here")
    p.add_argument("--patch_major_input", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="host pre-patchifies batches so the patch embed "
                        "runs as one dense matmul (train fast path; measured "
                        "313.7->258.0 ms on swin_b@160^3 — PERF.md r4). "
                        "--no-patch_major_input restores the dense-grid "
                        "conv path")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="override jax platform (e.g. cpu for smoke runs)")
    p.add_argument("--log_dir", default=None, help="jsonl metric log dir")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--workers", default=max((os.cpu_count() or 1) - 1, 0),
                   type=int, help="batch-assembly threads (0 = inline)")
    p.add_argument("--prefetch", default=2, type=int,
                   help="batches kept ready on a background thread "
                        "(0 = synchronous; reference analogue: DataLoader "
                        "workers, run_swin_mae3d.py:578-586)")
    p.add_argument("--mesh_space", default=1, type=int,
                   help="shard the voxel grid's first spatial dim over this "
                        "many devices ([data, space] mesh — lifts the "
                        "one-chip HBM ceiling)")
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
    return p.parse_args(argv)


def build_datasets(args):
    if args.dataset == "synthetic":
        class _Synth:
            def __init__(self, scenes):
                self.scenes = scenes

            def __len__(self):
                return len(self.scenes)

            def __getitem__(self, i):
                return {"rgbsigma": self.scenes[i]}

        # disjoint val draw (seed offset) so eval PSNR measures generalization
        if getattr(args, "synthetic_hard", False):
            # pretrain on the same hard distribution the detector finetunes
            # on (grids only; annotations unused by the MAE)
            from nerf_mae_tpu.data.datasets import synthetic_detection_scenes

            mk = lambda n, seed: [
                s["rgbsigma"]
                for s in synthetic_detection_scenes(
                    n, args.resolution, seed, hard=True)
            ]
        else:
            mk = lambda n, seed: synthetic_scenes(n, args.resolution, seed)
        n_val = args.n_synthetic_val or max(args.n_synthetic // 4, 2)
        return (
            _Synth(mk(args.n_synthetic, args.seed)),
            _Synth(mk(n_val, args.seed + 10_000)),
        )
    split = load_split(args.dataset_split) if args.dataset_split else {}
    train = SceneDataset(
        args.features_path,
        scene_list=split.get("train"),
        dataset_type=args.dataset,
        flip_prob=args.flip_prob,
        rotate_prob=args.rotate_prob,
        percent_train=args.percent_train,
    )
    val = SceneDataset(
        args.features_path,
        scene_list=split.get("val", split.get("test")),
        dataset_type=args.dataset,
    )
    return train, val


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)
    from common import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        force=True,  # the env's sitecustomize pre-installs root handlers
    )
    log = logging.getLogger("run_mae_pretrain")

    mae_cfg = MAEConfig(
        swin=SWIN_PRESETS[args.backbone_type],
        resolution=args.resolution,
        masking_prob=args.masking_prob,
        masking_strategy=args.masking_strategy,
        compute_dtype=args.compute_dtype,
        remat=not args.no_remat,
    )
    train_ds, val_ds = build_datasets(args)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    total_steps = args.steps or steps_per_epoch * args.num_epochs
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        seed=args.seed,
    )

    from common import build_mesh

    mesh = build_mesh(args)
    log.info("devices: %s (mesh %s)", jax.devices(), mesh.shape)
    trainer = MAETrainer(mae_cfg, train_cfg, total_steps, mesh)
    state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        tmpl = {"params": state.params}
        if args.mode == "train":
            tmpl["opt_state"] = state.opt_state
        restored = restore_checkpoint(args.checkpoint, template=tmpl)
        state = state.replace(params=restored["params"])
        if args.mode == "train":
            state = state.replace(opt_state=restored["opt_state"])
        log.info("restored checkpoint from %s", args.checkpoint)

    # --patch_major_input: the iterator emits [B, T, T, T, p^3, 4] via the
    # fused native pad+patchify on the pool workers; the device runs the
    # patch embed as a dense matmul (same bytes transferred; see the
    # layout note in config.MAEConfig)
    pm = (
        SWIN_PRESETS.get(args.backbone_type,
                         SWIN_PRESETS["swin_s"]).patch_size[0]
        if args.patch_major_input else 0
    )
    # make_train_batches also applies the [data, space] grid specs when
    # --mesh_space > 1 (device_put on the prefetch thread: batch N+1's host
    # work and H2D transfer overlap the device step on batch N); under
    # --device_data the corpus lives in HBM and batches are on-device gathers
    from common import make_train_batches

    batches = make_train_batches(
        args, mesh,
        lambda: mae_batch_iterator(
            train_ds, args.batch_size, args.resolution, seed=args.seed,
            workers=args.workers, patch_major=pm,
        ),
        corpus_iter_factory=lambda: mae_batch_iterator(
            train_ds, args.batch_size, args.resolution, shuffle=False,
            loop=False, drop_last=False, workers=args.workers,
            patch_major=pm,
        ),
    )

    def run_eval(state):
        it = mae_batch_iterator(
            val_ds, min(args.batch_size, len(val_ds)), args.resolution,
            shuffle=False, loop=False, drop_last=False,
        )
        ms = []
        for batch in it:
            if batch["grids"].shape[0] % mesh.shape["data"]:
                continue  # static-shape: skip ragged tail batch
            from nerf_mae_tpu.parallel import grid_pspec

            batch = shard_batch(batch, mesh,
                                specs={"grids": grid_pspec(mesh)})
            ms.append({k: float(v) for k, v in trainer.eval_step(state, batch).items()})
        if not ms:
            return {}
        agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        log.info("eval: %s", agg)
        return agg

    if args.mode == "eval":
        agg = run_eval(state)
        if args.eval_json:
            with open(args.eval_json, "w") as f:
                json.dump(agg, f)
        return

    if args.mode == "benchmark":
        from common import maybe_profile

        batch = next(batches)
        trainer.train_step(state, batch)  # compile
        reps, times = 20, []
        with maybe_profile(args.profile_dir):
            for _ in range(reps):
                t = time.perf_counter()
                state, m = trainer.train_step(state, batch)
                jax.block_until_ready(m["loss"])
                times.append(time.perf_counter() - t)
        times = np.asarray(times) * 1000
        log.info("train step: %.2f ± %.2f ms (batch %d)",
                 times.mean(), times.std(), args.batch_size)
        return

    from nerf_mae_tpu.utils import MetricLogger

    mlog = MetricLogger(args.log_dir, use_wandb=args.wandb,
                        run_name=f"mae_{args.backbone_type}",
                        config=vars(args))
    best_psnr = -1.0
    t0 = time.time()
    for step in range(1, total_steps + 1):
        batch = next(batches)
        state, metrics = trainer.train_step(state, batch)
        if step % args.log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = args.log_interval * args.batch_size / (time.time() - t0)
            log.info(
                "step %d/%d loss %.4f (rgb %.4f alpha %.4f) gnorm %.3f %.1f grids/s",
                step, total_steps, m["loss"], m["loss_rgb"], m["loss_alpha"],
                m["grad_norm"], rate,
            )
            mlog.log(step, {**m, "grids_per_sec": rate})
            t0 = time.time()
        if step % args.eval_interval == 0 and len(val_ds):
            agg = run_eval(state)
            if agg:
                mlog.log(step, {f"val_{k}": v for k, v in agg.items()})
            if agg.get("psnr", -1) > best_psnr:
                best_psnr = agg["psnr"]
                save_checkpoint(
                    args.checkpoint_dir, step, state.params, state.opt_state,
                    extra={"psnr": best_psnr},
                )
                log.info("saved best-PSNR ckpt (%.3f) at step %d", best_psnr, step)
        elif step % args.ckpt_interval == 0:
            save_checkpoint(args.checkpoint_dir, step, state.params, state.opt_state)
    if hasattr(batches, "close"):
        batches.close()
    save_checkpoint(args.checkpoint_dir, total_steps, state.params, state.opt_state)
    log.info("done: %d steps", total_steps)


if __name__ == "__main__":
    main()
