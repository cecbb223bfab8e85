"""Reconstruction metrics (masked MSE / PSNR).

Same definitions as the reference (reference: nerf_rpn/model/metrics.py:69-79,
used by the MAE eval loop at nerf_mae/run_swin_mae3d.py:758-760): MSE over
elements selected by a broadcast mask, PSNR = -10 log10(MSE).
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over elements where mask (broadcast to pred) is set."""
    mask = jnp.broadcast_to(mask, pred.shape).astype(jnp.float32)
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return (se * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def masked_psnr(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(masked_mse(pred, target, mask), 1e-12))
