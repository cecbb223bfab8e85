#!/usr/bin/env python
"""Generate golden fixtures for the ScanNet OBB-fitting math.

Imports the *actual* reference rotating-calipers implementation
(/root/reference/data/scannet/MinimumBoundingBox.py — pure python + scipy,
no shims needed) and records its outputs on seeded 2D point clouds, plus the
full 7-DoF instance OBBs per generate_bbox.py:10-27 (that wrapper's 5 lines —
z-extent concat — are re-derived inline here because generate_bbox.py itself
imports cv2/plyfile, unavailable in this environment).

tests/test_scannet_obb.py pins nerf_mae_tpu.data.scannet_obb against
tests/fixtures/golden_obb.npz.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/data/scannet/MinimumBoundingBox.py"
OUT = os.path.join(REPO, "tests", "fixtures", "golden_obb.npz")


def load_reference_mbb():
    spec = importlib.util.spec_from_file_location("ref_mbb", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.MinimumBoundingBox


def ref_instance_obb(MinimumBoundingBox, vertices: np.ndarray) -> np.ndarray:
    """generate_bbox.py:10-27 find_minimum_bounding_box, re-derived."""
    min_z, max_z = vertices[:, 2].min(), vertices[:, 2].max()
    box = MinimumBoundingBox(vertices[:, :2])
    center = np.array(box.rectangle_center)
    size = np.array((box.length_parallel, box.length_orthogonal))
    return np.concatenate(
        [center, [(min_z + max_z) / 2], size, [max_z - min_z],
         [box.unit_vector_angle]]
    )


def main() -> None:
    MinimumBoundingBox = load_reference_mbb()
    rng = np.random.RandomState(20260819)
    out = {}

    # 2D clouds of varying size/shape: gaussian blobs, rotated boxes + noise,
    # anisotropic clusters
    clouds = []
    for i in range(12):
        n = int(rng.randint(4, 200))
        base = rng.randn(n, 2) * rng.uniform(0.5, 5.0, 2)
        ang = rng.uniform(0, np.pi)
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]])
        clouds.append(base @ rot.T + rng.uniform(-10, 10, 2))
    for i, c in enumerate(clouds):
        box = MinimumBoundingBox(c)
        out[f"cloud_{i}"] = c
        out[f"rect_{i}"] = np.array(
            [box.rectangle_center[0], box.rectangle_center[1],
             box.length_parallel, box.length_orthogonal,
             box.unit_vector_angle, box.area])

    # full 7-DoF instance OBBs on 3D clouds
    for i in range(6):
        n = int(rng.randint(5, 400))
        v = rng.randn(n, 3) * rng.uniform(0.3, 4.0, 3) + rng.uniform(-5, 5, 3)
        out[f"verts_{i}"] = v
        out[f"obb_{i}"] = ref_instance_obb(MinimumBoundingBox, v)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
