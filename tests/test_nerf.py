"""NeRF pipeline tests: rays, volume rendering, fit-on-analytic-scene,
grid extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.nerf.extract import extract_rgbsigma_grid
from nerf_mae_tpu.nerf.model import NeRFMLP, positional_encoding
from nerf_mae_tpu.nerf.render import get_rays, render_rays
from nerf_mae_tpu.nerf.train import NeRFTrainer


def look_at(eye, target=(0, 0, 0), up=(0, 0, 1)):
    eye = np.asarray(eye, np.float32)
    f = eye - np.asarray(target, np.float32)
    f /= np.linalg.norm(f)
    r = np.cross(np.asarray(up, np.float32), f)
    r /= np.linalg.norm(r)
    u = np.cross(f, r)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, f, eye
    return c2w


def analytic_apply(_params, pts, viewdir):
    """Ground-truth field: red solid sphere radius 0.5 at origin."""
    d = jnp.linalg.norm(pts, axis=-1)
    sigma = jnp.where(d < 0.5, 20.0, 0.0)
    rgb_logits = jnp.broadcast_to(
        jnp.array([4.0, -4.0, -4.0]), pts.shape[:-1] + (3,)
    )
    return rgb_logits, sigma


class TestRender:
    def test_ray_directions(self):
        pose = jnp.eye(4)
        o, d = get_rays(pose, 4, 4, focal=4.0)
        assert o.shape == (4, 4, 3) and d.shape == (4, 4, 3)
        np.testing.assert_allclose(np.asarray(o), 0.0)
        # central rays point along -z
        assert float(d[2, 2, 2]) == -1.0

    def test_empty_space_renders_background(self):
        def empty(_p, pts, vd):
            return jnp.zeros(pts.shape[:-1] + (3,)), jnp.full(pts.shape[:-1], -100.0)

        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.array([[0.0, 0, -1]]), (4, 1))
        out = render_rays(None, empty, o, d, 0.1, 2.0, 16)
        np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-5)
        out_w = render_rays(None, empty, o, d, 0.1, 2.0, 16, white_bkgd=True)
        np.testing.assert_allclose(np.asarray(out_w["rgb"]), 1.0, atol=1e-5)

    def test_solid_sphere_hit_and_miss(self):
        # ray through the center hits red; ray far off to the side misses
        o = jnp.array([[0.0, 0, 2.0], [3.0, 3.0, 2.0]])
        d = jnp.array([[0.0, 0, -1.0], [0.0, 0, -1.0]])
        out = render_rays(None, analytic_apply, o, d, 0.5, 4.0, 128)
        rgb = np.asarray(out["rgb"])
        acc = np.asarray(out["acc"])
        assert acc[0] > 0.99 and acc[1] < 1e-3
        assert rgb[0, 0] > 0.9 and rgb[0, 1] < 0.05  # red
        # depth ~ distance to sphere front surface (z=2 -> 1.5)
        assert abs(float(out["depth"][0]) - 1.5) < 0.1


class TestPosEnc:
    def test_shapes_and_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        e = positional_encoding(x, 3)
        assert e.shape == (1, 18)
        np.testing.assert_allclose(float(e[0, 0]), np.sin(0.5), rtol=1e-6)


class TestFitAndExtract:
    @pytest.fixture(scope="class")
    def fitted(self):
        # render GT views of the analytic sphere with our own renderer
        h = w = 20
        focal = 20.0
        eyes = [
            (2, 0, 0), (0, 2, 0), (-2, 0, 0), (0, -2, 0), (1.4, 1.4, 0.5),
            (0, 1.4, 1.4),
        ]
        poses = np.stack([look_at(e) for e in eyes])
        images = []
        for p in poses:
            o, d = get_rays(jnp.asarray(p), h, w, focal)
            out = render_rays(
                None, analytic_apply, o.reshape(-1, 3), d.reshape(-1, 3),
                0.5, 4.0, 96,
            )
            images.append(np.asarray(out["rgb"]).reshape(h, w, 3))
        images = np.stack(images)

        trainer = NeRFTrainer(near=0.5, far=4.0, n_samples=48, ray_batch=512,
                              lr=2e-3,
                              model=NeRFMLP(depth=3, width=48, skip_at=1,
                                            pos_freqs=5, dir_freqs=2))
        params, psnr = trainer.fit(images, poses, focal, steps=250, seed=0,
                                   log_every=250)
        return trainer, params, psnr

    def test_fit_converges(self, fitted):
        _, _, psnr = fitted
        assert psnr > 14.0, psnr  # sphere scene fits quickly

    def test_extract_grid(self, fitted):
        trainer, params, _ = fitted
        eyes = [(2, 0, 0), (0, 2, 0)]
        poses = np.stack([look_at(e) for e in eyes])
        out = extract_rgbsigma_grid(
            params, trainer._apply,
            bbox_min=np.array([-1.0, -1, -0.5]),
            bbox_max=np.array([1.0, 1, 0.5]),
            train_poses=poses, max_res=16, chunk=2048,
        )
        g = out["rgbsigma"]
        assert g.shape == (16, 16, 8, 4)
        assert list(out["resolution"]) == [16, 16, 8]
        # density concentrated inside the sphere: center >> corner
        assert g[8, 8, 4, 3] > g[0, 0, 0, 3] + 1.0
        # learned color is red-ish at the center
        assert g[8, 8, 4, 0] > g[8, 8, 4, 1]
