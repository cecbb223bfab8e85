"""Per-scene NeRF trainer (reference: data/scannet/run_nerf.py:1188-1480
train_nerf — ray batching, MSE photometric loss, Adam)."""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_mae_tpu.nerf.model import NeRFMLP
from nerf_mae_tpu.nerf.render import get_rays, render_rays

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class NeRFTrainer:
    near: float
    far: float
    n_samples: int = 64
    lr: float = 5e-4
    ray_batch: int = 4096
    scene_scale: float = 1.0  # divides xyz before encoding
    white_bkgd: bool = False
    model: Optional[NeRFMLP] = None

    def __post_init__(self):
        if self.model is None:
            self.model = NeRFMLP()
        self.tx = optax.adam(self.lr)

        def apply(params, pts, viewdir):
            return self.model.apply({"params": params}, pts / self.scene_scale,
                                    viewdir)

        self._apply = apply
        self.train_step = jax.jit(self._train_step)
        self.render_chunk = jax.jit(self._render_chunk)

    def init(self, rng: jax.Array):
        params = self.model.init(
            rng, jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3))
        )["params"]
        return params, self.tx.init(params)

    def _train_step(self, params, opt_state, rays_o, rays_d, target_rgb, rng):
        def loss_fn(p):
            out = render_rays(
                p, self._apply, rays_o, rays_d, self.near, self.far,
                self.n_samples, rng, self.white_bkgd,
            )
            return ((out["rgb"] - target_rgb) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _render_chunk(self, params, rays_o, rays_d):
        return render_rays(
            params, self._apply, rays_o, rays_d, self.near, self.far,
            self.n_samples, None, self.white_bkgd,
        )

    def fit(
        self,
        images: np.ndarray,  # [V, H, W, 3] in [0, 1]
        poses: np.ndarray,  # [V, 4, 4] camera-to-world
        focal: float,
        steps: int = 2000,
        seed: int = 0,
        log_every: int = 200,
    ):
        """Train on random ray batches; returns (params, final_psnr)."""
        v, h, w, _ = images.shape
        all_o, all_d = [], []
        for i in range(v):
            o, d = get_rays(jnp.asarray(poses[i]), h, w, focal)
            all_o.append(np.asarray(o).reshape(-1, 3))
            all_d.append(np.asarray(d).reshape(-1, 3))
        rays_o = np.concatenate(all_o)
        rays_d = np.concatenate(all_d)
        targets = images.reshape(-1, 3).astype(np.float32)

        rng = jax.random.PRNGKey(seed)
        params, opt_state = self.init(rng)
        rs = np.random.RandomState(seed)
        loss = np.inf
        for step in range(1, steps + 1):
            sel = rs.randint(0, rays_o.shape[0], self.ray_batch)
            params, opt_state, loss = self.train_step(
                params, opt_state, jnp.asarray(rays_o[sel]),
                jnp.asarray(rays_d[sel]), jnp.asarray(targets[sel]),
                jax.random.fold_in(rng, step),
            )
            if step % log_every == 0:
                psnr = -10 * np.log10(max(float(loss), 1e-10))
                logger.info("nerf step %d/%d loss %.5f psnr %.2f",
                            step, steps, float(loss), psnr)
        return params, -10 * np.log10(max(float(loss), 1e-10))
