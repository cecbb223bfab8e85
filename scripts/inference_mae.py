#!/usr/bin/env python
"""Out-of-box MAE inference + feature extraction.

Counterpart of the reference's inference.py / inference_save_grid.py
(reference: nerf_mae/model/mae/inference.py:290-430, inference_save_grid.py)
and the README "model usage" feature-extraction API (reference:
README.md:134-201): loads one scene npz, runs masked reconstruction, saves
the predicted grid (npz), PLY visualizations, and optionally the 4-scale
encoder feature pyramid.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from common import load_mae_params, setup

import jax
import jax.numpy as jnp

from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS
from nerf_mae_tpu.data.datasets import density_to_alpha, scannet_density_to_alpha
from nerf_mae_tpu.models.mae import SwinMAE3D, mae_loss, pad_grids_to_batch
from nerf_mae_tpu.viz import save_masked_recon


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="NeRF-MAE single-scene inference")
    p.add_argument("--scene_npz", required=True)
    p.add_argument("--mae_checkpoint", required=True)
    p.add_argument("--backbone_type", default="swin_s")
    p.add_argument("--resolution", default=160, type=int)
    p.add_argument("--masking_prob", default=0.75, type=float)
    p.add_argument("--dataset", default="front3d")
    p.add_argument("--out_dir", default="inference_out")
    p.add_argument("--save_features", action="store_true",
                   help="also dump the 4-scale encoder pyramid")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--compute_dtype", default="bfloat16")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    log = logging.getLogger("inference_mae")

    cfg = MAEConfig(
        swin=SWIN_PRESETS[args.backbone_type],
        resolution=args.resolution,
        masking_prob=args.masking_prob,
        compute_dtype=args.compute_dtype,
    )
    model = SwinMAE3D(cfg)
    params = load_mae_params(args.mae_checkpoint, cfg)

    with np.load(args.scene_npz) as f:
        rgbsigma = np.array(f["rgbsigma"]).astype(np.float32)
    alpha_fn = (
        scannet_density_to_alpha if args.dataset == "scannet" else density_to_alpha
    )
    rgbsigma[..., -1] = alpha_fn(rgbsigma[..., -1])

    batch, sizes = pad_grids_to_batch([rgbsigma], args.resolution,
                                      channel_first=False)
    rng = jax.random.PRNGKey(args.seed)
    pred, token_mask = jax.jit(
        lambda p, g: model.apply({"params": p}, g, True, rngs={"mask": rng})
    )(params, jnp.asarray(batch))
    loss, aux = mae_loss(pred, jnp.asarray(batch), token_mask,
                         jnp.asarray(sizes), cfg)
    log.info("loss %.4f (rgb %.4f alpha %.4f)", float(loss),
             float(aux["loss_rgb"]), float(aux["loss_alpha"]))

    os.makedirs(args.out_dir, exist_ok=True)
    scene = os.path.splitext(os.path.basename(args.scene_npz))[0]
    pred_np = np.asarray(pred)[0]
    np.savez_compressed(
        os.path.join(args.out_dir, f"{scene}_pred.npz"),
        rgbsigma=pred_np, token_mask=np.asarray(token_mask)[0],
    )
    save_masked_recon(
        os.path.join(args.out_dir, scene), batch[0], pred_np,
        np.asarray(token_mask)[0], patch=cfg.swin.patch_size[0],
    )
    log.info("saved prediction grid + PLYs to %s", args.out_dir)

    if args.save_features:
        feats = jax.jit(
            lambda p, g: model.apply({"params": p}, g, True,
                                     method=SwinMAE3D.encode)
        )(params, jnp.asarray(batch))
        np.savez_compressed(
            os.path.join(args.out_dir, f"{scene}_features.npz"),
            **{f"level{i}": np.asarray(f)[0] for i, f in enumerate(feats)},
        )
        log.info("saved feature pyramid: %s",
                 [tuple(f.shape[1:]) for f in feats])


if __name__ == "__main__":
    main()
