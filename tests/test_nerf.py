"""NeRF pipeline tests: rays, volume rendering, fit-on-analytic-scene,
grid extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.nerf.extract import extract_rgbsigma_grid
from nerf_mae_tpu.nerf.model import NeRFMLP, positional_encoding
from nerf_mae_tpu.nerf.render import (
    depth_and_std,
    depth_nll_loss,
    get_rays,
    render_rays,
    render_rays_depth_guided,
    render_rays_hierarchical,
    sample_3sigma,
    sample_pdf,
)
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
            trainer.fine_params(params), trainer._apply,
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


class TestHierarchical:
    def test_sample_pdf_concentrates_on_heavy_bins(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, axis=0)  # 8 bins
        w = np.zeros((2, 8), np.float32)
        w[:, 4] = 1.0  # all mass in bin [0.5, 0.625)
        t = np.asarray(sample_pdf(bins, jnp.asarray(w), 32))
        assert ((t >= 0.45) & (t <= 0.65)).mean() > 0.9
        # stochastic draw stays in-range and sorted input -> in [0, 1]
        t2 = np.asarray(
            sample_pdf(bins, jnp.asarray(w), 32, jax.random.PRNGKey(0))
        )
        assert t2.min() >= 0.0 and t2.max() <= 1.0

    def test_hierarchical_matches_analytic_scene(self):
        o = jnp.array([[0.0, 0, 2.0]])
        d = jnp.array([[0.0, 0, -1.0]])
        out = render_rays_hierarchical(
            None, None, analytic_apply, o, d, 0.5, 4.0, 32, 64,
        )
        # fine pass refines the surface estimate vs a 32-sample coarse pass
        assert abs(float(out["depth"][0]) - 1.5) < 0.05
        assert float(out["acc"][0]) > 0.99
        assert out["rgb0"].shape == (1, 3)  # coarse outputs exposed

    def test_hierarchical_fit_trains_both_networks(self):
        h = w = 8
        focal = 8.0
        poses = np.stack([look_at((2, 0, 0)), look_at((0, 2, 0))])
        images = np.full((2, h, w, 3), 0.5, np.float32)
        trainer = NeRFTrainer(
            near=0.5, far=4.0, n_samples=16, n_importance=8, ray_batch=64,
            lr=1e-3,
            model=NeRFMLP(depth=2, width=16, skip_at=1, pos_freqs=3,
                          dir_freqs=2),
        )
        params, _ = trainer.fit(images, poses, focal, steps=3, log_every=10)
        assert "fine" in params and "coarse" in params
        assert trainer.fine_params(params) is params["fine"]

    def test_depth_nll_loss(self):
        z = jnp.linspace(0.5, 4.0, 16)[None].repeat(3, axis=0)
        w = jnp.ones((3, 16)) / 16.0
        depth = (w * z).sum(axis=1)
        target = depth + jnp.array([0.0, 1.0, 0.0])
        valid = jnp.array([True, True, False])
        l_exact = depth_nll_loss(depth, z, w, depth, valid)
        l_off = depth_nll_loss(depth, z, w, target, valid)
        assert float(l_off) > float(l_exact)
        # invalid-only -> zero contribution, no nan
        l_none = depth_nll_loss(depth, z, w, target, jnp.zeros(3, bool))
        assert float(l_none) == 0.0

    def test_sample_3sigma_band_and_clamp(self):
        low = jnp.array([1.0, 0.0])
        high = jnp.array([2.0, 0.5])
        t = np.asarray(sample_3sigma(low, high, 16, near=0.5, far=4.0))
        assert t.shape == (2, 16)
        # ray 0: samples inside [1, 2], concentrated near the center 1.5
        assert t[0].min() >= 1.0 - 1e-5 and t[0].max() <= 2.0 + 1e-5
        assert ((t[0] > 1.25) & (t[0] < 1.75)).mean() > 0.5
        # ray 1: band clamped to near=0.5 -> all samples at/above near
        assert t[1].min() >= 0.5 - 1e-5

    def test_depth_and_std(self):
        t = jnp.linspace(1.0, 3.0, 9)[None]
        w = np.zeros((1, 9), np.float32)
        w[0, 4] = 1.0  # all mass at t=2
        d, s = depth_and_std(t, jnp.asarray(w))
        assert float(d[0]) == pytest.approx(2.0)
        assert float(s[0]) == pytest.approx(0.0, abs=1e-6)

    def test_depth_guided_render_matches_analytic_scene(self):
        # valid sensor depth on ray 0, invalid on ray 1 (predicted-depth
        # branch); both should localize the sphere front surface at 1.5
        o = jnp.array([[0.0, 0, 2.0], [0.0, 0, 2.0]])
        d = jnp.array([[0.0, 0, -1.0], [0.0, 0, -1.0]])
        td = jnp.array([1.5, 0.0])
        out = render_rays_depth_guided(
            None, analytic_apply, o, d, 0.5, 4.0,
            target_depth=td, depth_low=td - 0.2, depth_high=td + 0.2,
            valid_depth=jnp.array([True, False]), n_samples=32,
        )
        assert out["rgb"].shape == (2, 3)
        assert abs(float(out["depth"][0]) - 1.5) < 0.05
        assert abs(float(out["depth"][1]) - 1.5) < 0.15
        assert float(out["acc"][0]) > 0.99
        # merged z_vals are sorted per ray
        z = np.asarray(out["z_vals"])
        assert (np.diff(z, axis=1) >= 0).all()

    def test_depth_guided_fit_runs_and_grads_flow(self):
        h = w = 8
        focal = 8.0
        poses = np.stack([look_at((0, 2.0, 0))])
        images = np.full((1, h, w, 3), 0.5, np.float32)
        depths = np.full((1, h, w), 1.5, np.float32)
        trainer = NeRFTrainer(
            near=0.5, far=4.0, n_samples=16, ray_batch=64, lr=1e-3,
            depth_guided=True,
            model=NeRFMLP(depth=2, width=16, skip_at=1, pos_freqs=3,
                          dir_freqs=2),
        )
        params, _ = trainer.fit(images, poses, focal, steps=3, log_every=10,
                                depths=depths)
        assert np.isfinite(
            float(jnp.concatenate([
                p.ravel() for p in jax.tree.leaves(params)
            ]).sum())
        )

    def test_depth_guided_excludes_hierarchical(self):
        with pytest.raises(ValueError):
            NeRFTrainer(near=0.5, far=4.0, n_importance=8, depth_guided=True)

    def test_cam_embed_trains_per_view_latents(self):
        # two views of the same gray scene but with different exposures:
        # only the per-view latent can explain the difference
        h = w = 8
        focal = 8.0
        poses = np.stack([look_at((2, 0, 0)), look_at((0, 2, 0))])
        images = np.stack([
            np.full((h, w, 3), 0.25, np.float32),
            np.full((h, w, 3), 0.75, np.float32),
        ])
        trainer = NeRFTrainer(
            near=0.5, far=4.0, n_samples=16, ray_batch=128, lr=5e-3,
            cam_embed_dim=4,
            model=NeRFMLP(depth=2, width=16, skip_at=1, pos_freqs=3,
                          dir_freqs=2, cam_embed_dim=4),
        )
        params, _ = trainer.fit(images, poses, focal, steps=30, log_every=50)
        cam = np.asarray(params["cam"])
        assert cam.shape == (2, 4)
        # latents moved apart from the zero init
        assert np.abs(cam[0] - cam[1]).max() > 1e-4
        # test-time render (zero latent) still works
        o = jnp.array([[0.0, 2.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        out = trainer.render_chunk(params, o, d)
        assert np.isfinite(np.asarray(out["rgb"])).all()

    def test_depth_supervision_improves_depth(self):
        # one wall at z = -1.5 from the camera; rgb is uniform so only the
        # depth prior can localize it
        h = w = 8
        focal = 8.0
        poses = np.stack([look_at((0, 2.0, 0))])
        images = np.full((1, h, w, 3), 0.5, np.float32)
        depths = np.full((1, h, w), 3.5, np.float32)
        kw = dict(near=0.5, far=6.0, n_samples=24, ray_batch=64, lr=2e-3,
                  model=NeRFMLP(depth=2, width=24, skip_at=1, pos_freqs=4,
                                dir_freqs=2))
        t_d = NeRFTrainer(depth_loss_weight=1.0, **kw)
        p_d, _ = t_d.fit(images, poses, focal, steps=150, log_every=200,
                         depths=depths)
        o = jnp.array([[0.0, 2.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        out = t_d.render_chunk(p_d, o, d)
        err_d = abs(float(out["depth"][0]) - 3.5)
        assert err_d < 0.6, err_d


@pytest.mark.quick
class TestSceneLoading:
    """scripts/run_nerf.py load_scene: rgb + sensor-depth plumbing
    (reference depth conventions: data/scannet/run_nerf.py:846-902)."""

    def _write_scene(self, d, with_depth):
        import json as _json
        import os as _os

        from PIL import Image

        _os.makedirs(f"{d}/images", exist_ok=True)
        if with_depth:
            _os.makedirs(f"{d}/depth", exist_ok=True)
        frames = []
        for i in range(2):
            img = (np.random.rand(8, 12, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(f"{d}/images/f{i}.png")
            if with_depth:
                dep = np.full((8, 12), 1500, np.uint16)
                dep[:2] = 0  # invalid band
                Image.fromarray(dep).save(f"{d}/depth/f{i}.png")
            pose = np.eye(4)
            frames.append({"file_path": f"images/f{i}.png",
                           "transform_matrix": pose.tolist()})
        with open(f"{d}/transforms.json", "w") as f:
            _json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    def test_depth_maps_loaded_and_scaled(self, tmp_path):
        import sys as _sys

        _sys.path.insert(0, "scripts")
        from run_nerf import load_scene

        d = str(tmp_path)
        self._write_scene(d, with_depth=True)
        images, poses, focal, depths, valid = load_scene(
            d, "transforms.json", 1, depth_dir=f"{d}/depth",
            depth_scale=1000.0)
        assert images.shape == (2, 8, 12, 3) and poses.shape == (2, 4, 4)
        assert depths.shape == (2, 8, 12)
        np.testing.assert_allclose(depths[0, 4, 4], 1.5)  # mm -> m
        assert not valid[:, :2].any() and valid[:, 2:].all()

    def test_no_depth_returns_none(self, tmp_path):
        import sys as _sys

        _sys.path.insert(0, "scripts")
        from run_nerf import load_scene

        d = str(tmp_path)
        self._write_scene(d, with_depth=False)
        _, _, _, depths, valid = load_scene(d, "transforms.json", 1)
        assert depths is None and valid is None
