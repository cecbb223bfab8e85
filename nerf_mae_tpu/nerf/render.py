"""Ray generation + volume rendering, pure jittable functions.

(reference: data/scannet/run_nerf.py:782-1180 render_rays / ray batching —
re-expressed as batched static-shape ops: stratified sampling along all rays
at once, alpha compositing via cumulative products.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_rays(
    pose: jnp.ndarray,  # [4, 4] camera-to-world
    h: int,
    w: int,
    focal: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (origins [H, W, 3], directions [H, W, 3]) in world space
    (OpenGL convention: camera looks down -z)."""
    i, j = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="xy")
    dirs = jnp.stack(
        [(i - w * 0.5 + 0.5) / focal, -(j - h * 0.5 + 0.5) / focal,
         -jnp.ones_like(i, jnp.float32)],
        axis=-1,
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def render_rays(
    params,
    model_apply,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: float,
    far: float,
    n_samples: int = 64,
    rng: Optional[jax.Array] = None,
    white_bkgd: bool = False,
):
    """Single-level stratified volume rendering.
    Returns dict {rgb [N, 3], depth [N], acc [N]}."""
    n = rays_o.shape[0]
    t = jnp.linspace(near, far, n_samples)
    t = jnp.broadcast_to(t, (n, n_samples))
    if rng is not None:  # stratified jitter
        mids = (t[:, 1:] + t[:, :-1]) / 2
        lo = jnp.concatenate([t[:, :1], mids], axis=1)
        hi = jnp.concatenate([mids, t[:, -1:]], axis=1)
        t = lo + jax.random.uniform(rng, t.shape) * (hi - lo)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]  # [N, S, 3]
    viewdir = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb_logits, sigma_raw = model_apply(params, pts, viewdir[:, None, :])

    delta = jnp.diff(t, axis=1)
    delta = jnp.concatenate([delta, jnp.full((n, 1), 1e10)], axis=1)
    delta = delta * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma_raw) * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones((n, 1)), trans[:, :-1]], axis=1)
    weights = alpha * trans  # [N, S]

    rgb = jax.nn.sigmoid(rgb_logits)
    comp_rgb = (weights[..., None] * rgb).sum(axis=1)
    depth = (weights * t).sum(axis=1)
    acc = weights.sum(axis=1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return {"rgb": comp_rgb, "depth": depth, "acc": acc}
