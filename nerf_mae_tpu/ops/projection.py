"""2D projection auxiliary loss: project 3D box corner points to fixed
virtual camera views and penalize their 2D displacement.

Capability match for the reference's always-on RPN 2D regression loss and
FCOS's optional variant (reference: nerf_rpn/model/rpn.py:76-165 get_w2cs /
project, :421-453 loss; fcos/loss.py:447-475). Cameras sit at the four upper
corners of the scene cube looking at its centroid; boxes contribute their
two diagonal corner points (obb2points_3d).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from nerf_mae_tpu.ops.obb import obb2points_3d


def _look_at_rotation(cam: np.ndarray, at: np.ndarray) -> np.ndarray:
    """(reference: rpn.py:37-76 look_at_rotation as called through
    c2w_from_loc_and_at, whose default up is (0, 0, 1) — the (0, 0, -1)
    branch inside look_at_rotation is dead code on that path)."""
    up = np.array([0.0, 0.0, 1.0])
    z = cam - at
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)


@functools.lru_cache(maxsize=8)
def get_w2cs(res: int = 160) -> np.ndarray:
    """[4, 4, 4] world-to-camera matrices for the four corner views
    (reference: rpn.py:76-88)."""
    centroid = np.full(3, res / 2.0)
    positions = (
        np.array([[res, res, res], [res, -res, res],
                  [-res, res, res], [-res, -res, res]], np.float64) + centroid
    )
    out = []
    for pos in positions:
        c2w = np.eye(4)
        c2w[:3, 3] = pos
        c2w[:3, :3] = _look_at_rotation(pos, centroid)
        out.append(np.linalg.inv(c2w))
    return np.stack(out).astype(np.float32)


_K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)


def project_points(points: jnp.ndarray, w2c: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] world points -> [..., 2] pixel coords under one view
    (reference: rpn.py:91-103)."""
    homog = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    cam = homog @ w2c.T  # [..., 4]
    pix = cam[..., :3] @ jnp.asarray(_K).T
    return pix[..., :2] / pix[..., 2:3]


def projection_2d_loss(
    pred_boxes: jnp.ndarray,  # [..., 6|7] AABB or OBB
    target_boxes: jnp.ndarray,
    weights: jnp.ndarray,  # [...] per-box weight (e.g. pos mask/centerness)
    resolution: int = 160,
) -> jnp.ndarray:
    """Weighted sum of smooth-L1 (beta 1/9) pixel displacements of the
    projected diagonal corner points over the 4 views, divided by the
    resolution (reference: rpn.py:421-453 and fcos/loss.py:447-475 — both
    compute smooth-L1 on raw pixel coordinates, then divide by the mesh
    dim). Count normalization is the caller's: the RPN divides by num_pos
    (rpn.py:452-453); FCOS divides by (4 views x 2 points x 2 coords) and
    then by the centerness sum (fcos/loss.py:473-475, :581-585)."""
    if pred_boxes.shape[-1] == 7:
        p_pts = obb2points_3d(pred_boxes)  # [..., 2, 3]
        t_pts = obb2points_3d(target_boxes)
    else:
        p_pts = jnp.stack([pred_boxes[..., :3], pred_boxes[..., 3:6]], axis=-2)
        t_pts = jnp.stack([target_boxes[..., :3], target_boxes[..., 3:6]], axis=-2)

    w2cs = jnp.asarray(get_w2cs(resolution))  # [4, 4, 4]
    d2_sum = 0.0
    for v in range(4):
        pp = project_points(p_pts, w2cs[v])  # [..., 2, 2]
        tp = project_points(t_pts, w2cs[v])
        d = jnp.abs(pp - tp)  # raw pixel displacement
        beta = 1.0 / 9.0
        sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        d2_sum = d2_sum + sl1.sum(axis=(-1, -2))  # [...]
    return (d2_sum * weights).sum() / resolution
