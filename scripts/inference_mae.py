#!/usr/bin/env python
"""Out-of-box MAE inference + feature extraction.

Counterpart of the reference's inference.py / inference_save_grid.py
(reference: nerf_mae/model/mae/inference.py:290-430, inference_save_grid.py)
and the README "model usage" feature-extraction API (reference:
README.md:134-201): loads one scene npz (or, with --scene_dir, every scene
in a dataset features/ folder), runs masked reconstruction, saves the
predicted grid (npz), PLY visualizations, and optionally the 4-scale
encoder feature pyramid.

Batch mode (--scene_dir) is the inference_save_grid.py equivalent: every
non-array metadata key of the input npz (resolution, bbox_min/bbox_max,
scale, offset, scene transforms — whatever the producer wrote, see
inference_save_grid.py:340-360's resolution/rgbsigma contract) is passed
through verbatim into the output npz so downstream tools (proposals2ngp,
voxel viz) keep working off the predictions.
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
    p = argparse.ArgumentParser(description="NeRF-MAE scene inference")
    p.add_argument("--scene_npz", default=None,
                   help="single scene npz (rgbsigma [+ metadata])")
    p.add_argument("--scene_dir", default=None,
                   help="batch over every .npz in this folder "
                        "(e.g. <dataset>/features), passing each file's "
                        "metadata keys through to the output npz")
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
    if not args.scene_npz and not args.scene_dir:
        raise SystemExit("pass --scene_npz or --scene_dir")
    model = SwinMAE3D(cfg)
    params = load_mae_params(args.mae_checkpoint, cfg)
    alpha_fn = (
        scannet_density_to_alpha if args.dataset == "scannet" else density_to_alpha
    )
    rng = jax.random.PRNGKey(args.seed)
    fwd = jax.jit(
        lambda p, g: model.apply({"params": p}, g, True, rngs={"mask": rng})
    )
    enc = jax.jit(
        lambda p, g: model.apply({"params": p}, g, True,
                                 method=SwinMAE3D.encode)
    )
    os.makedirs(args.out_dir, exist_ok=True)

    if args.scene_dir:
        paths = sorted(
            os.path.join(args.scene_dir, f)
            for f in os.listdir(args.scene_dir) if f.endswith(".npz")
        )
        log.info("batch mode: %d scenes in %s", len(paths), args.scene_dir)
    else:
        paths = [args.scene_npz]

    for path in paths:
        meta = {}
        with np.load(path, allow_pickle=True) as f:
            rgbsigma = np.array(f["rgbsigma"]).astype(np.float32)
            # metadata passthrough: everything except the grid rides along
            # into the output npz (bbox/scale/resolution contract of
            # inference_save_grid.py:340-360)
            meta = {k: np.array(f[k]) for k in f.files if k != "rgbsigma"}
        if rgbsigma.dtype == np.uint8:
            rgbsigma = rgbsigma.astype(np.float32) / 255.0
        rgbsigma[..., -1] = alpha_fn(rgbsigma[..., -1])

        batch, sizes = pad_grids_to_batch([rgbsigma], args.resolution,
                                          channel_first=False)
        pred, token_mask = fwd(params, jnp.asarray(batch))
        loss, aux = mae_loss(pred, jnp.asarray(batch), token_mask,
                             jnp.asarray(sizes), cfg)
        scene = os.path.splitext(os.path.basename(path))[0]
        log.info("%s: loss %.4f (rgb %.4f alpha %.4f)", scene, float(loss),
                 float(aux["loss_rgb"]), float(aux["loss_alpha"]))

        pred_np = np.asarray(pred)[0]
        np.savez_compressed(
            os.path.join(args.out_dir, f"{scene}_pred.npz"),
            rgbsigma=pred_np, token_mask=np.asarray(token_mask)[0],
            valid_size=sizes[0], **meta,
        )
        save_masked_recon(
            os.path.join(args.out_dir, scene), batch[0], pred_np,
            np.asarray(token_mask)[0], patch=cfg.swin.patch_size[0],
        )

        if args.save_features:
            feats = enc(params, jnp.asarray(batch))
            np.savez_compressed(
                os.path.join(args.out_dir, f"{scene}_features.npz"),
                **{f"level{i}": np.asarray(f)[0]
                   for i, f in enumerate(feats)},
                valid_size=sizes[0], **meta,
            )
            log.info("saved feature pyramid: %s",
                     [tuple(f.shape[1:]) for f in feats])
    log.info("saved predictions + PLYs to %s", args.out_dir)


if __name__ == "__main__":
    main()
