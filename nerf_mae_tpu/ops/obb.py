"""Oriented-box <-> polygon/AABB conversions (z-rotation only).

Capability match for the reference's coder/misc.py
(reference: nerf_rpn/model/coder/misc.py:1-100): obb2poly, obb2hbb(+3d),
rectpoly2obb with the w>h angle regularization, obb2points_3d. All pure
jnp over arbitrary leading dims.

2D OBBs are [..., 5] = (x, y, w, h, theta); 3D are [..., 7].
"""

from __future__ import annotations

import jax.numpy as jnp

PI = jnp.pi


def regular_theta(theta, start=-PI / 2):
    """Wrap theta into [start, start + pi) (reference: misc.py:5-12)."""
    return (theta - start) % PI + start


def regular_obb(obb5):
    """Canonicalize: force w >= h, adjusting theta by pi/2
    (reference: misc.py:14-20)."""
    x, y, w, h, t = (obb5[..., i] for i in range(5))
    wr = jnp.maximum(w, h)
    hr = jnp.minimum(w, h)
    tr = jnp.where(w > h, t, t + PI / 2)
    return jnp.stack([x, y, wr, hr, regular_theta(tr)], axis=-1)


def obb2poly(obb5):
    """[..., 5] -> [..., 8] corner coords (x1 y1 x2 y2 x3 y3 x4 y4)
    (reference: misc.py:47-60)."""
    c = obb5[..., 0:2]
    w = obb5[..., 2:3]
    h = obb5[..., 3:4]
    t = obb5[..., 4:5]
    cos, sin = jnp.cos(t), jnp.sin(t)
    v1 = jnp.concatenate([w / 2 * cos, -w / 2 * sin], axis=-1)
    v2 = jnp.concatenate([-h / 2 * sin, -h / 2 * cos], axis=-1)
    return jnp.concatenate(
        [c + v1 + v2, c + v1 - v2, c - v1 - v2, c - v1 + v2], axis=-1
    )


def obb2hbb(obb5):
    """Smallest enclosing 2D AABB [..., 4] (reference: misc.py:77-84)."""
    c = obb5[..., 0:2]
    w = obb5[..., 2:3]
    h = obb5[..., 3:4]
    t = obb5[..., 4:5]
    cos, sin = jnp.cos(t), jnp.sin(t)
    bias = jnp.concatenate(
        [jnp.abs(w / 2 * cos) + jnp.abs(h / 2 * sin),
         jnp.abs(w / 2 * sin) + jnp.abs(h / 2 * cos)],
        axis=-1,
    )
    return jnp.concatenate([c - bias, c + bias], axis=-1)


def obb2hbb_3d(obb7):
    """[..., 7] OBB -> [..., 6] enclosing AABB (reference: misc.py:86-94)."""
    hbb = obb2hbb(obb7[..., jnp.array([0, 1, 3, 4, 6])])
    z0 = obb7[..., 2:3] - obb7[..., 5:6] / 2
    z1 = obb7[..., 2:3] + obb7[..., 5:6] / 2
    return jnp.concatenate([hbb[..., 0:2], z0, hbb[..., 2:4], z1], axis=-1)


def rectpoly2obb(polys):
    """[..., 8] rectangular polygon -> [..., 5] canonical OBB
    (reference: misc.py:22-45)."""
    eps = 1e-7
    theta = jnp.arctan2(
        -(polys[..., 3] - polys[..., 1]), polys[..., 2] - polys[..., 0] + eps
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x = polys[..., 0::2].mean(-1)
    y = polys[..., 1::2].mean(-1)
    px = polys[..., 0::2] - x[..., None]
    py = polys[..., 1::2] - y[..., None]
    # theta measures the negated edge angle, so aligning the polygon with
    # the axes is a rotation by +theta (reference: misc.py:25-31)
    rx = px * cos[..., None] - py * sin[..., None]
    ry = px * sin[..., None] + py * cos[..., None]
    w = rx.max(-1) - rx.min(-1)
    h = ry.max(-1) - ry.min(-1)
    return regular_obb(jnp.stack([x, y, w, h, theta], axis=-1))


def obb2points_3d(obb7):
    """Two diagonal corner points for the 2D projection loss
    (reference: misc.py:96-100). [..., 7] -> [..., 2, 3]."""
    c = obb7[..., 0:3]
    w = obb7[..., 3:4]
    l = obb7[..., 4:5]
    h = obb7[..., 5:6]
    t = obb7[..., 6:7]
    cos, sin = jnp.cos(t), jnp.sin(t)
    v = jnp.concatenate([w / 2 * cos - l / 2 * sin, w / 2 * sin + l / 2 * cos, h / 2], axis=-1)
    return jnp.stack([c - v, c + v], axis=-2)
