"""MAE block masking on the token grid, fully vectorized.

The reference masks 4^3 blocks of *tokens* with a triple Python loop and one
shared mask per batch (reference: nerf_mae/model/mae/swin_mae3d.py:1314-1382).
Here the mask is a single Bernoulli draw on the block grid, upsampled by
repeat — O(1) dispatch, jittable, and per-sample by default (the reference's
shared-mask quirk is available via per_sample=False for parity runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_mask_3d(
    rng: jax.Array,
    batch: int,
    token_grid: int,
    block: int = 4,
    p_remove: float = 0.75,
    strategy: str = "random",
    per_sample: bool = True,
) -> jnp.ndarray:
    """Returns a bool mask [batch, T, T, T] over tokens; True = masked.

    strategy "random": each block^3 token block is masked i.i.d. with
      probability p_remove (reference: swin_mae3d.py:1364-1373).
    strategy "grid": deterministically masks the first quarter of blocks in
      scan order, reproducing the reference's v2 'grid' branch
      (reference: swin_mae3d.py:1330-1362 — num_patches//4 blocks, unshuffled).
    """
    m = token_grid // block
    if strategy == "random":
        shape = (batch, m, m, m) if per_sample else (1, m, m, m)
        blocks = jax.random.bernoulli(rng, p_remove, shape)
        if not per_sample:
            blocks = jnp.broadcast_to(blocks, (batch, m, m, m))
    elif strategy == "grid":
        n = m**3
        flat = jnp.arange(n) < (n // 4)
        blocks = jnp.broadcast_to(flat.reshape(1, m, m, m), (batch, m, m, m))
    else:
        raise ValueError(f"unknown masking strategy: {strategy}")

    mask = jnp.repeat(blocks, block, axis=1)
    mask = jnp.repeat(mask, block, axis=2)
    mask = jnp.repeat(mask, block, axis=3)
    return mask
