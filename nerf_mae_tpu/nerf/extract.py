"""Query a trained NeRF on a regular lattice -> rgbsigma grid npz.

Same contract as the reference's extract_nerf
(reference: data/scannet/run_nerf.py:1918-1975): resolution per axis scaled
so the longest bbox edge gets max_res; rgb = sigmoid(raw) averaged over the
training view directions; density left raw; saved as (W, L, H, 4) with
resolution/bbox/scale/offset metadata.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def extract_rgbsigma_grid(
    params,
    model_apply,  # (params, pts [N, S, 3], viewdir [N, S, 3]) -> (rgb, sigma)
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    train_poses: np.ndarray,  # [V, 4, 4] for view-dir averaging
    max_res: int = 160,
    chunk: int = 65536,
) -> dict:
    bbox_min = np.asarray(bbox_min, np.float32)
    bbox_max = np.asarray(bbox_max, np.float32)
    res = (bbox_max - bbox_min) / (bbox_max - bbox_min).max() * max_res
    res = np.round(res).astype(int)
    rx, ry, rz = (int(r) for r in res)

    xs = np.linspace(bbox_min[0], bbox_max[0], rx)
    ys = np.linspace(bbox_min[1], bbox_max[1], ry)
    zs = np.linspace(bbox_min[2], bbox_max[2], rz)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)

    viewdirs = np.stack(
        [p[:3, :3] @ np.array([0, 0, -1.0], np.float32) for p in train_poses]
    )
    viewdirs /= np.linalg.norm(viewdirs, axis=1, keepdims=True)

    @jax.jit
    def query(pts_chunk, vd):
        rgb_logits, sigma = model_apply(
            params, pts_chunk[:, None, :], vd[None, None, :]
        )
        return jax.nn.sigmoid(rgb_logits)[:, 0], sigma[:, 0]

    n = pts.shape[0]
    pad = (-n) % chunk
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    rgb_sum = np.zeros((n, 3), np.float32)
    sigma_out = np.zeros((n,), np.float32)
    for vd in viewdirs:
        for s in range(0, pts_p.shape[0], chunk):
            rgb, sigma = query(jnp.asarray(pts_p[s : s + chunk]), jnp.asarray(vd))
            e = min(s + chunk, n)
            if s >= n:
                break
            rgb_sum[s:e] += np.asarray(rgb)[: e - s]
            sigma_out[s:e] = np.asarray(sigma)[: e - s]
    rgb_mean = rgb_sum / len(viewdirs)

    rgbsigma = np.concatenate([rgb_mean, sigma_out[:, None]], axis=1)
    rgbsigma = rgbsigma.reshape(rx, ry, rz, 4)  # (W, L, H, 4), channel-last
    return {
        "rgbsigma": rgbsigma.astype(np.float32),
        "resolution": res,
        "bbox_min": bbox_min,
        "bbox_max": bbox_max,
        "scale": 1.0,
        "offset": 0.0,
        "from_mitsuba": False,
    }
