#!/usr/bin/env python
"""Convert a reference PyTorch NeRF-MAE checkpoint into this framework's
orbax format, enabling direct parity checks against the published weights
(reference: README.md:127 HuggingFace checkpoints; state_dict layout from
nerf_mae/model/mae/swin_mae3d.py SwinTransformer_MAE3D_New).

Weight layout rules (verified numerically against torch):
  Conv3d    (O, I, D, H, W) -> (D, H, W, I, O)
  ConvT3d   (I, O, D, H, W) -> (D, H, W, I, O) + spatial flip
  Linear    (O, I)          -> (I, O)
Use --decoder_type unetr for full-decoder parity (the subpixel default has
no reference counterpart for decoder1/out).
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from common import setup


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _convT(w):
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]
    )


def _lin(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def convert_state_dict(sd: dict, depths) -> dict:
    """torch state_dict (numpy values) -> SwinMAE3D param tree (without
    subpixel head / decoder1)."""
    g = lambda k: np.asarray(sd[k], np.float32)
    params = {
        "patch_embed": {"kernel": _conv(g("patch_partition.0.weight")),
                        "bias": g("patch_partition.0.bias")},
        "patch_norm": {"scale": g("patch_partition.2.weight"),
                       "bias": g("patch_partition.2.bias")},
        "mask_token": g("mask_token"),
    }

    enc = {}
    for s, depth in enumerate(depths):
        off = 0
        if s > 0:
            pm = f"stages.{s}.0."
            enc[f"merge{s}"] = {
                "norm": {"scale": g(pm + "norm.weight"),
                         "bias": g(pm + "norm.bias")},
                "reduction": {"kernel": _lin(g(pm + "reduction.weight"))},
            }
            off = 1
        for b in range(depth):
            p = f"stages.{s}.{b + off}."
            enc[f"stage{s}_block{b}"] = {
                "norm1": {"scale": g(p + "norm1.weight"),
                          "bias": g(p + "norm1.bias")},
                "norm2": {"scale": g(p + "norm2.weight"),
                          "bias": g(p + "norm2.bias")},
                "qkv_kernel": _lin(g(p + "attn.qkv.weight")),
                "qkv_bias": g(p + "attn.qkv.bias"),
                "proj_kernel": _lin(g(p + "attn.proj.weight")),
                "proj_bias": g(p + "attn.proj.bias"),
                "rel_pos_bias_table": g(p + "attn.relative_position_bias_table"),
                "mlp_fc1": {"kernel": _lin(g(p + "mlp.0.weight")),
                            "bias": g(p + "mlp.0.bias")},
                "mlp_fc2": {"kernel": _lin(g(p + "mlp.3.weight")),
                            "bias": g(p + "mlp.3.bias")},
            }
    params["encoder"] = enc

    for d in (4, 3, 2):
        p = f"decoder{d}."
        params[f"decoder{d}"] = {
            "up": {"kernel": _convT(g(p + "transp_conv.weight")),
                   "bias": g(p + "transp_conv.bias")},
            "res": {
                "conv1": {"kernel": _conv(g(p + "conv_block.conv1.weight")),
                          "bias": g(p + "conv_block.conv1.bias")},
                "conv2": {"kernel": _conv(g(p + "conv_block.conv2.weight")),
                          "bias": g(p + "conv_block.conv2.bias")},
                "conv3": {"kernel": _conv(g(p + "conv_block.conv3.weight")),
                          "bias": g(p + "conv_block.conv3.bias")},
            },
        }

    if "decoder1.transp_conv.weight" in sd:  # unetr decoder parity
        p = "decoder1."
        params["decoder1"] = {
            "up": {"kernel": _convT(g(p + "transp_conv.weight")),
                   "bias": g(p + "transp_conv.bias")},
            "res": {
                "conv1": {"kernel": _conv(g(p + "conv_block.conv1.weight")),
                          "bias": g(p + "conv_block.conv1.bias")},
                "conv2": {"kernel": _conv(g(p + "conv_block.conv2.weight")),
                          "bias": g(p + "conv_block.conv2.bias")},
            },
        }
        params["out_head"] = {
            "conv": {"kernel": _conv(g("out.conv.weight")),
                     "bias": g("out.conv.bias")},
        }
    return params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--backbone_type", default="swin_s")
    p.add_argument("--resolution", default=160, type=int)
    p.add_argument("--decoder_type", default="unetr", choices=["unetr", "subpixel"])
    p.add_argument("--platform", default="cpu")
    args = p.parse_args(argv)
    setup(args)
    log = logging.getLogger("convert")

    import torch

    ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    log.info("loaded %d tensors", len(sd))

    from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS
    from nerf_mae_tpu.train.checkpoint import save_checkpoint

    cfg = MAEConfig(swin=SWIN_PRESETS[args.backbone_type],
                    resolution=args.resolution, decoder_type=args.decoder_type)
    params = convert_state_dict(sd, cfg.swin.depths)
    if args.decoder_type == "subpixel" and "decoder1" in params:
        params.pop("decoder1")
        params.pop("out_head", None)
    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree.leaves(params))
    log.info("converted %d params", n)
    save_checkpoint(args.output_dir, 0, params)
    log.info("wrote orbax checkpoint to %s", args.output_dir)


if __name__ == "__main__":
    main()
