"""Per-scene NeRF trainer (reference: data/scannet/run_nerf.py:1188-1480
train_nerf — ray batching, MSE photometric loss, Adam; hierarchical
coarse/fine sampling when n_importance > 0 (:939-981) and optional
dense-depth-prior Gaussian-NLL depth supervision (:1316-1324))."""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_mae_tpu.nerf.model import NeRFMLP
from nerf_mae_tpu.nerf.render import (
    depth_nll_loss,
    get_rays,
    render_rays,
    render_rays_depth_guided,
    render_rays_hierarchical,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class NeRFTrainer:
    near: float
    far: float
    n_samples: int = 64
    n_importance: int = 0  # >0 enables the coarse/fine hierarchical path
    depth_loss_weight: float = 0.0
    # Depth-guided 3-sigma sampling (dense-depth-priors train path,
    # reference: data/scannet/run_nerf.py:846-902): half the samples
    # concentrate around the sensor depth (or, where invalid, the
    # predicted depth). Mutually exclusive with n_importance.
    depth_guided: bool = False
    # Relative sensor noise: the 3-sigma band is depth * (1 +- 3*sigma_frac)
    # (stands in for the reference's per-pixel completion uncertainty).
    depth_sigma_frac: float = 0.03
    # >0: per-training-view appearance latents, optimized jointly with the
    # network in params["cam"] (reference: data/scannet/run_nerf.py:298-359).
    # Test-time renders use a zero latent.
    cam_embed_dim: int = 0
    lr: float = 5e-4
    ray_batch: int = 4096
    scene_scale: float = 1.0  # divides xyz before encoding
    white_bkgd: bool = False
    model: Optional[NeRFMLP] = None

    def __post_init__(self):
        if self.model is None:
            self.model = NeRFMLP(cam_embed_dim=self.cam_embed_dim)
        if self.depth_guided and self.hierarchical:
            raise ValueError(
                "depth_guided replaces hierarchical sampling "
                "(reference uses one or the other)"
            )
        self.tx = optax.adam(self.lr)

        def apply(params, pts, viewdir):
            return self.model.apply({"params": params}, pts / self.scene_scale,
                                    viewdir)

        self._apply = apply
        self.train_step = jax.jit(self._train_step)
        self.render_chunk = jax.jit(self._render_chunk)

    @property
    def hierarchical(self) -> bool:
        return self.n_importance > 0

    def init(self, rng: jax.Array, n_views: int = 0):
        def one(r):
            return self.model.init(
                r, jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3))
            )["params"]

        if self.hierarchical:
            rc, rf = jax.random.split(rng)
            params = {"coarse": one(rc), "fine": one(rf)}
        else:
            params = {"coarse": one(rng)}
        if self.cam_embed_dim:
            if n_views <= 0:
                raise ValueError("cam_embed_dim > 0 requires n_views")
            params["cam"] = jnp.zeros(
                (n_views, self.cam_embed_dim), jnp.float32
            )
        return params, self.tx.init(params)

    def _make_apply(self, cam):
        """model_apply closure conditioning the color head on a per-ray
        camera latent [N, cam_embed_dim] (None -> unconditioned)."""
        if cam is None:
            return self._apply

        def apply(params, pts, viewdir):
            return self.model.apply(
                {"params": params}, pts / self.scene_scale, viewdir,
                cam[:, None, :],
            )

        return apply

    def _render(self, params, rays_o, rays_d, rng,
                target_depth=None, valid_depth=None, cam=None):
        apply = self._make_apply(cam)
        if self.depth_guided and target_depth is not None:
            band = 3.0 * self.depth_sigma_frac * target_depth
            return render_rays_depth_guided(
                params["coarse"], apply, rays_o, rays_d,
                self.near, self.far, target_depth,
                target_depth - band, target_depth + band, valid_depth,
                self.n_samples, rng, self.white_bkgd,
            )
        if self.hierarchical:
            return render_rays_hierarchical(
                params["coarse"], params["fine"], apply, rays_o, rays_d,
                self.near, self.far, self.n_samples, self.n_importance, rng,
                self.white_bkgd,
            )
        return render_rays(
            params["coarse"], apply, rays_o, rays_d, self.near,
            self.far, self.n_samples, rng, self.white_bkgd,
        )

    def _train_step(self, params, opt_state, rays_o, rays_d, target_rgb,
                    target_depth, valid_depth, view_idx, rng):
        def loss_fn(p):
            cam = p["cam"][view_idx] if self.cam_embed_dim else None
            out = self._render(p, rays_o, rays_d, rng,
                               target_depth, valid_depth, cam)
            img_loss = ((out["rgb"] - target_rgb) ** 2).mean()
            loss = img_loss
            if self.hierarchical:  # coarse head trains too (:1326-1328)
                loss = loss + ((out["rgb0"] - target_rgb) ** 2).mean()
            if self.depth_loss_weight > 0.0:
                loss = loss + self.depth_loss_weight * depth_nll_loss(
                    out["depth"], out["z_vals"], out["weights"],
                    target_depth, valid_depth,
                )
            return loss, img_loss

        (loss, img_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, img_loss

    def _render_chunk(self, params, rays_o, rays_d):
        return self._render(params, rays_o, rays_d, None)

    def fine_params(self, params):
        """The network used at extraction time (fine when hierarchical)."""
        return params["fine"] if self.hierarchical else params["coarse"]

    def fit(
        self,
        images: np.ndarray,  # [V, H, W, 3] in [0, 1]
        poses: np.ndarray,  # [V, 4, 4] camera-to-world
        focal: float,
        steps: int = 2000,
        seed: int = 0,
        log_every: int = 200,
        depths: Optional[np.ndarray] = None,  # [V, H, W] metric depth
        valid_depths: Optional[np.ndarray] = None,  # [V, H, W] bool
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
        if depths is not None:
            tgt_depth = depths.reshape(-1).astype(np.float32)
            val_depth = (
                valid_depths.reshape(-1).astype(bool)
                if valid_depths is not None
                else tgt_depth > 0
            )
        else:
            tgt_depth = np.zeros(rays_o.shape[0], np.float32)
            val_depth = np.zeros(rays_o.shape[0], bool)

        rng = jax.random.PRNGKey(seed)
        params, opt_state = self.init(rng, n_views=v)
        rs = np.random.RandomState(seed)
        img_loss = np.inf
        for step in range(1, steps + 1):
            sel = rs.randint(0, rays_o.shape[0], self.ray_batch)
            params, opt_state, loss, img_loss = self.train_step(
                params, opt_state, jnp.asarray(rays_o[sel]),
                jnp.asarray(rays_d[sel]), jnp.asarray(targets[sel]),
                jnp.asarray(tgt_depth[sel]), jnp.asarray(val_depth[sel]),
                jnp.asarray(sel // (h * w), jnp.int32),  # ray -> view
                jax.random.fold_in(rng, step),
            )
            if step % log_every == 0:
                psnr = -10 * np.log10(max(float(img_loss), 1e-10))
                logger.info("nerf step %d/%d loss %.5f psnr %.2f",
                            step, steps, float(loss), psnr)
        return params, -10 * np.log10(max(float(img_loss), 1e-10))
