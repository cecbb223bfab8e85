#!/usr/bin/env python
"""Generate golden fixtures for ROI pooling from the reference's pure-torch
ROIPool (reference: nerf_rpn/model/detector.py:170-438).

Our ops/roi_align.py is a deliberate TPU re-design (fixed S^3 trilinear
sampling lattice instead of the reference's per-roi variable-size voxel grid
+ maxpool/resize — documented in PARITY.md); this fixture makes its deviation
from the reference a *measured* number on smooth feature fields instead of an
unknown. Records, on low-frequency synthetic pyramids:

  - rotated_forward with feature_extracting_type='interpolation'
    (detector.py:264-405) on rotated boxes;
  - normal_forward (maxpool, detector.py:407-438) on axis-aligned boxes.

tests/test_roi_align_golden.py compares ops/roi_align.py against these with
documented tolerances.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
OUT = os.path.join(REPO, "tests", "fixtures", "golden_roi.npz")

STRIDES = [4, 8, 16, 32]
RES = 64            # level-0 feature resolution (world res 256 at stride 4)
C = 6
S = 5               # output size


def smooth_pyramid(rs: np.random.RandomState):
    """Per-level channel-first [C, W, L, H] features sampled from one smooth
    world-space field (low frequency relative to every bin size), so any
    reasonable pooling of a box reads nearly the same values."""
    amps = rs.uniform(0.5, 1.0, (C, 3))
    freqs = rs.uniform(0.25, 0.9, (C, 3)) * (2 * np.pi / 256.0)
    phases = rs.uniform(0, 2 * np.pi, (C, 3))

    def field(pos):  # pos [..., 3] world coords -> [..., C]
        out = []
        for c in range(C):
            v = sum(amps[c, d] * np.sin(freqs[c, d] * pos[..., d] + phases[c, d])
                    for d in range(3))
            out.append(v)
        return np.stack(out, axis=-1)

    levels = []
    for s in STRIDES:
        n = RES * 4 // s
        idx = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1)
        levels.append(
            np.moveaxis(field(idx * float(s)), -1, 0).astype(np.float32))
    return levels, field


def main() -> None:
    from make_golden_det_fixtures import _install_shims

    _install_shims()
    tm = types.ModuleType("torchmetrics")
    tm.JaccardIndex = object
    sys.modules.setdefault("torchmetrics", tm)
    # CPU tensors report device -1; route the reference's .to(get_device())
    # calls to the cpu device
    torch.Tensor.get_device = lambda self: "cpu"

    sys.path.insert(0, "/root/reference")       # for nerf_mae.* imports
    sys.path.insert(0, "/root/reference/nerf_rpn")
    from model.detector import ROIPool

    rs = np.random.RandomState(42)
    levels, _ = smooth_pyramid(rs)
    fx = {f"feat_{i}": f for i, f in enumerate(levels)}

    # rotated boxes, a few per level, comfortably inside the volume
    n_per = 4
    rois = []
    for lvl, stride in enumerate(STRIDES):
        ctr = rs.uniform(64, 192, (n_per, 3))
        size = rs.uniform(3.0, 8.0, (n_per, 3)) * stride
        ang = rs.uniform(-np.pi, np.pi, (n_per, 1))
        lv = np.full((n_per, 1), lvl, np.float32)
        rois.append(np.concatenate([lv, ctr, size, ang], -1))
    rois = np.concatenate(rois).astype(np.float32)
    fx["rot_rois"] = rois

    pool = ROIPool(output_size=[S, S, S], spatial_scale=STRIDES,
                   enlarge_scale=0.2, is_rotated_bbox=True,
                   feature_extracting_type="interpolation")
    feats_t = [[torch.from_numpy(f) for f in levels]]
    with torch.no_grad():
        out = pool.rotated_forward(feats_t, [torch.from_numpy(rois)])
    fx["rot_out"] = out[0].numpy()  # [R, C, S, S, S]

    # axis-aligned boxes for normal_forward (maxpool path)
    rois_ab = []
    for lvl, stride in enumerate(STRIDES):
        lo = rs.uniform(48, 160, (n_per, 3))
        sz = rs.uniform(3.0, 8.0, (n_per, 3)) * stride
        lv = np.full((n_per, 1), lvl, np.float32)
        rois_ab.append(np.concatenate([lv, lo, lo + sz], -1))
    rois_ab = np.concatenate(rois_ab).astype(np.float32)
    fx["aabb_rois"] = rois_ab

    pool_ab = ROIPool(output_size=[S, S, S], spatial_scale=STRIDES,
                      enlarge_scale=0.2, is_rotated_bbox=False,
                      feature_extracting_type="pooling")
    with torch.no_grad():
        out_ab = pool_ab.normal_forward(feats_t, [torch.from_numpy(rois_ab)])
    fx["aabb_out"] = out_ab[0].numpy()

    np.savez_compressed(OUT, **fx)
    print(f"wrote {OUT}: rot_out {fx['rot_out'].shape}, "
          f"aabb_out {fx['aabb_out'].shape}")


if __name__ == "__main__":
    main()
