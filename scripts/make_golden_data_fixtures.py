#!/usr/bin/env python
"""Generate golden data-contract fixtures from the reference dataset code.

Writes tiny scene files to a temp dir, loads them through the *actual*
reference dataset classes (/root/reference/nerf_rpn/datasets.py), and
records what comes out: the density->alpha formulas (Front3D/Hypersim exp
formula and the ScanNet ReLU variant), layout conventions, box passthrough,
the SR and semantic target paths, and the deterministic augmentations
(rot90 / flips at prob=1 via augment_rpn_inputs, rotate_and_scale_scene at
a fixed angle/scale). tests/test_parity_golden_data.py replays the same
on-disk layout through our SceneDataset and pins equality.

The reference's uint8 branch is NOT pinned: it assigns float alpha back
into the uint8 array before the /255 cast, truncating every alpha to 0 or 1
(datasets.py:128-141) — our loader deliberately skips density->alpha for
quantized grids (data/datasets.py:52-56), documented in PARITY.md.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "golden_data.npz")


def main():
    sys.path.insert(0, "/root/reference/nerf_rpn")
    import datasets as ref

    fx = {}
    rs = np.random.RandomState(30)

    with tempfile.TemporaryDirectory() as td:
        feat = os.path.join(td, "features")
        boxes_d = os.path.join(td, "boxes")
        outfeat = os.path.join(td, "out")
        sem_d = os.path.join(td, "sem")
        for d in (feat, boxes_d, outfeat, sem_d):
            os.makedirs(d)

        # scene "a": fp32 raw densities in a realistic range + AABB boxes
        rgbsigma = rs.uniform(-3.0, 4.0, (9, 7, 5, 4)).astype(np.float32)
        rgbsigma[..., :3] = rs.rand(9, 7, 5, 3)
        boxes = np.array([[1, 1, 1, 5, 4, 3], [2, 0.5, 0, 8, 6, 4.5],
                          [0, 0, 0, 9, 7, 5]], np.float32)
        np.savez(os.path.join(feat, "a.npz"), rgbsigma=rgbsigma)
        np.save(os.path.join(boxes_d, "a.npy"), boxes)
        fx["in_rgbsigma"], fx["in_boxes"] = rgbsigma.copy(), boxes

        # SR + semantic targets for scene "a"
        out_rgb = rs.uniform(-2.0, 3.0, (12, 10, 8, 4)).astype(np.float32)
        np.savez(os.path.join(outfeat, "a.npz"), rgbsigma=out_rgb)
        sem = rs.randint(0, 19, (9, 7, 5)).astype(np.int64)
        np.save(os.path.join(sem_d, "a.npy"), sem)
        fx["in_out_rgbsigma"], fx["in_sem"] = out_rgb.copy(), sem

        ds = ref.Front3DRPNDataset(feat, boxes_d, scene_list=["a"])
        g, b, _ = ds[0]  # [C, W, L, H], [N, 6]
        fx["front3d_rgbsigma"] = np.transpose(g.numpy(), (1, 2, 3, 0))
        fx["front3d_boxes"] = b.numpy()

        ds = ref.ScanNetRPNDataset(["a"], feat, boxes_d)
        g, b, _ = ds[0]
        fx["scannet_rgbsigma"] = np.transpose(g.numpy(), (1, 2, 3, 0))

        ds = ref.Front3DSuperResolutionDataset(feat, outfeat,
                                               scene_list=["a"])
        g, out_g, _ = ds[0]
        fx["sr_in"] = np.transpose(g.numpy(), (1, 2, 3, 0))
        fx["sr_out"] = np.transpose(out_g.numpy(), (1, 2, 3, 0))

        ds = ref.Front3DSemanticDataset(feat, sem_d, scene_list=["a"])
        g, s, _ = ds[0]
        fx["sem_in"] = np.transpose(g.numpy(), (1, 2, 3, 0))
        fx["sem_labels"] = s.numpy()

    # ---- deterministic augmentations (prob 1) on the loaded scene -------
    base = torch.tensor(fx["front3d_rgbsigma"]).permute(3, 0, 1, 2)
    tb_aabb = torch.tensor(fx["front3d_boxes"])
    obb = np.array([[4.0, 3.0, 2.0, 3.0, 2.0, 1.5, 0.3],
                    [6.0, 5.0, 3.0, 2.0, 4.0, 2.0, -0.8]], np.float32)
    fx["in_obb"] = obb

    g2, b2 = ref.BaseDataset.augment_rpn_inputs(
        base.clone(), tb_aabb.clone(), flip_prob=0.0, rotate_prob=1.0,
        rot_scale_prob=0.0)
    fx["rot90_rgbsigma"] = np.transpose(g2.numpy(), (1, 2, 3, 0))
    fx["rot90_boxes"] = b2.numpy()
    _, b2o = ref.BaseDataset.augment_rpn_inputs(
        base.clone(), torch.tensor(obb), flip_prob=0.0, rotate_prob=1.0,
        rot_scale_prob=0.0)
    fx["rot90_obb"] = b2o.numpy()

    g3, b3 = ref.BaseDataset.augment_rpn_inputs(
        base.clone(), tb_aabb.clone(), flip_prob=1.0, rotate_prob=0.0,
        rot_scale_prob=0.0)
    fx["flip_rgbsigma"] = np.transpose(g3.numpy(), (1, 2, 3, 0))
    fx["flip_boxes"] = b3.numpy()
    _, b3o = ref.BaseDataset.augment_rpn_inputs(
        base.clone(), torch.tensor(obb), flip_prob=1.0, rotate_prob=0.0,
        rot_scale_prob=0.0)
    fx["flip_obb"] = b3o.numpy()

    g4, b4 = ref.rotate_and_scale_scene(
        base.clone(), torch.tensor(obb), angle=0.12, scale=1.07)
    fx["rotscale_rgbsigma"] = np.transpose(g4.numpy(), (1, 2, 3, 0))
    fx["rotscale_obb"] = b4.numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **fx)
    print(f"wrote {OUT}: {len(fx)} arrays, "
          f"{os.path.getsize(OUT) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
