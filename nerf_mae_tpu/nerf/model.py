"""NeRF radiance field MLP (frequency-encoded), flax.linen.

Capability match for the reference's per-scene NeRF used by the offline
grid-extraction pipeline (reference: data/scannet/run_nerf.py:546-1180 —
a dense-depth-prior NeRF; we implement the standard frequency-encoded MLP
core: 8x256 with a skip, density head + view-conditioned color head).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """[..., D] -> [..., D * 2 * n_freqs] sin/cos at octave frequencies."""
    freqs = 2.0 ** jnp.arange(n_freqs)
    xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    return enc.reshape(*x.shape[:-1], -1)


class NeRFMLP(nn.Module):
    depth: int = 8
    width: int = 256
    skip_at: int = 4
    pos_freqs: int = 10
    dir_freqs: int = 4
    # >0: the color head is additionally conditioned on a per-image latent
    # (the dense-depth-priors camera/appearance embedding, reference:
    # data/scannet/run_nerf.py:298-359 — there optimized jointly with the
    # network; our NeRFTrainer keeps the table in params["cam"]).
    cam_embed_dim: int = 0

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        viewdir: jnp.ndarray,
        cam_embed: Optional[jnp.ndarray] = None,  # [..., cam_embed_dim]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz [..., 3] (normalized to ~[-1, 1]), viewdir [..., 3] unit.
        Returns (rgb_logits [..., 3] pre-sigmoid, sigma_raw [...] pre-ReLU
        raw density — kept raw to mirror the reference's extraction contract
        at run_nerf.py:1946-1955)."""
        h = positional_encoding(xyz, self.pos_freqs)
        enc = h
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.width, name=f"fc{i}")(h))
            if i == self.skip_at:
                h = jnp.concatenate([h, enc], axis=-1)
        sigma = nn.Dense(1, name="sigma")(h)[..., 0]
        feat = nn.Dense(self.width, name="feat")(h)
        d = positional_encoding(viewdir, self.dir_freqs)
        d = jnp.broadcast_to(d, feat.shape[:-1] + (d.shape[-1],))
        color_in = [feat, d]
        if self.cam_embed_dim:
            ce = (
                cam_embed
                if cam_embed is not None
                else jnp.zeros(self.cam_embed_dim)  # test views: zero latent
            )
            color_in.append(
                jnp.broadcast_to(ce, feat.shape[:-1] + (self.cam_embed_dim,))
            )
        hc = nn.relu(nn.Dense(self.width // 2, name="color_fc")(
            jnp.concatenate(color_in, axis=-1)
        ))
        rgb = nn.Dense(3, name="rgb")(hc)
        return rgb, sigma
