"""Model-level tests for SwinMAE3D: shapes, loss semantics, training signal.

The tiny-config smoke mirrors the reference's de-facto unit test
(reference: nerf_mae/model/mae/swin_mae3d.py:1601-1653 — two odd-sized random
grids through pad -> mask -> encode -> decode -> loss), scaled down for CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_mae_tpu.config import MAEConfig, SwinConfig
from nerf_mae_tpu.models.mae import SwinMAE3D, mae_loss, pad_grids_to_batch


def tiny_cfg(**kw):
    swin = SwinConfig(embed_dim=12, depths=(1, 1, 2, 1), num_heads=(3, 6, 12, 24))
    defaults = dict(
        swin=swin, resolution=32, masking_prob=0.75, compute_dtype="float32",
        remat=False,
    )
    defaults.update(kw)
    return MAEConfig(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = SwinMAE3D(cfg)
    rng = jax.random.PRNGKey(0)
    grids = jnp.zeros((2, 32, 32, 32, 4))
    params = model.init(
        {"params": rng, "mask": rng, "droppath": rng}, grids, True
    )["params"]
    return cfg, model, params


class TestForward:
    def test_shapes(self, model_and_params):
        cfg, model, params = model_and_params
        grids = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 32, 4))
        pred, token_mask = model.apply(
            {"params": params}, grids, True, rngs={"mask": jax.random.PRNGKey(1)}
        )
        assert pred.shape == (2, 32, 32, 32, 4)
        assert pred.dtype == jnp.float32
        assert token_mask.shape == (2, 8, 8, 8)
        assert np.isfinite(np.asarray(pred)).all()

    def test_mask_actually_changes_output(self, model_and_params):
        cfg, model, params = model_and_params
        grids = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 32, 4))
        none_masked = jnp.zeros((1, 8, 8, 8), bool)
        all_masked = jnp.ones((1, 8, 8, 8), bool)
        p0, _ = model.apply({"params": params}, grids, True, token_mask=none_masked)
        p1, _ = model.apply({"params": params}, grids, True, token_mask=all_masked)
        assert np.abs(np.asarray(p0 - p1)).max() > 1e-4

    def test_encode_pyramid(self, model_and_params):
        cfg, model, params = model_and_params
        grids = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 32, 4))
        feats = model.apply(
            {"params": params}, grids, True, method=SwinMAE3D.encode
        )
        dims = cfg.swin.stage_dims
        assert [f.shape for f in feats] == [
            (1, 8, 8, 8, dims[0]),
            (1, 4, 4, 4, dims[1]),
            (1, 2, 2, 2, dims[2]),
            (1, 1, 1, 1, dims[3]),
        ]


class TestLoss:
    def test_loss_semantics(self, model_and_params):
        cfg, _, _ = model_and_params
        rs = np.random.RandomState(0)
        target = rs.rand(1, 32, 32, 32, 4).astype(np.float32)
        pred = rs.randn(1, 32, 32, 32, 4).astype(np.float32)
        sizes = jnp.array([[32, 32, 32]])
        mask = jnp.ones((1, 8, 8, 8), bool)
        loss, aux = mae_loss(jnp.asarray(pred), jnp.asarray(target), mask, sizes, cfg)
        # manual: rgb mse over alpha>0.01 voxels (sum over 3 ch / count voxels)
        am = (target[..., 3:] > 0.01).astype(np.float32)
        want_rgb = ((pred[..., :3] - target[..., :3]) ** 2 * am).sum() / am.sum()
        sig = 1 / (1 + np.exp(-pred[..., 3:]))
        want_alpha = ((sig - target[..., 3:]) ** 2).mean()
        np.testing.assert_allclose(float(aux["loss_rgb"]), want_rgb, rtol=1e-4)
        np.testing.assert_allclose(float(aux["loss_alpha"]), want_alpha, rtol=1e-4)
        np.testing.assert_allclose(float(loss), want_rgb + want_alpha, rtol=1e-4)

    def test_alpha_loss_respects_validity_and_mask(self, model_and_params):
        cfg, _, _ = model_and_params
        rs = np.random.RandomState(1)
        target = rs.rand(1, 32, 32, 32, 4).astype(np.float32)
        pred = rs.randn(1, 32, 32, 32, 4).astype(np.float32)
        # only first half of the grid valid; only half the tokens masked
        sizes = jnp.array([[16, 32, 32]])
        mask = jnp.zeros((1, 8, 8, 8), bool).at[:, :4].set(True)
        _, aux = mae_loss(jnp.asarray(pred), jnp.asarray(target), mask, sizes, cfg)
        # masked tokens cover h<16 which is fully valid -> 16*32*32 voxels
        assert int(aux["n_alpha"]) == 16 * 32 * 32
        # now mask only tokens in the padded (invalid) region -> zero count
        mask2 = jnp.zeros((1, 8, 8, 8), bool).at[:, 4:].set(True)
        _, aux2 = mae_loss(jnp.asarray(pred), jnp.asarray(target), mask2, sizes, cfg)
        assert int(aux2["n_alpha"]) == 0


class TestListAPI:
    def test_pad_grids_odd_sizes(self):
        # scaled-down version of the reference smoke shapes
        grids = [
            np.random.RandomState(0).rand(4, 30, 30, 28),
            np.random.RandomState(1).rand(4, 26, 32, 31),
        ]
        batch, sizes = pad_grids_to_batch(grids, 32)
        assert batch.shape == (2, 32, 32, 32, 4)
        np.testing.assert_array_equal(sizes, [[30, 30, 28], [26, 32, 31]])
        # content preserved, padding zero
        np.testing.assert_array_equal(
            batch[0, :30, :30, :28], np.moveaxis(grids[0], 0, -1).astype(np.float32)
        )
        assert (batch[0, 30:] == 0).all()

    def test_end_to_end_odd_grids(self, model_and_params):
        cfg, model, params = model_and_params
        grids = [
            np.random.RandomState(0).rand(4, 30, 30, 28).astype(np.float32),
            np.random.RandomState(1).rand(4, 26, 32, 31).astype(np.float32),
        ]
        batch, sizes = pad_grids_to_batch(grids, cfg.resolution)
        pred, token_mask = model.apply(
            {"params": params}, jnp.asarray(batch), True,
            rngs={"mask": jax.random.PRNGKey(0)},
        )
        loss, aux = mae_loss(pred, jnp.asarray(batch), token_mask, jnp.asarray(sizes), cfg)
        assert np.isfinite(float(loss))
        assert float(aux["loss_rgb"]) > 0 and float(aux["loss_alpha"]) > 0


class TestTrainingSignal:
    def test_loss_decreases(self, model_and_params):
        cfg, model, params = model_and_params
        rs = np.random.RandomState(0)
        batch = jnp.asarray(rs.rand(2, 32, 32, 32, 4).astype(np.float32))
        sizes = jnp.array([[32, 32, 32], [28, 30, 32]])
        tx = optax.adamw(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                pred, tm = model.apply(
                    {"params": p}, batch, False,
                    rngs={"mask": rng, "droppath": jax.random.fold_in(rng, 1)},
                )
                loss, aux = mae_loss(pred, batch, tm, sizes, cfg)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(12):
            params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


# not `quick`: two un-jitted full model.apply's dominate the quick tier
# (112 s of its ~207 s on this 1-core host; see pytest.ini tier budgets)
def test_patched_pred_is_exact_patchify_permutation():
    """SwinMAE3D(patched_pred=True) must equal patchify_3d of the voxel
    prediction bit-for-bit (it is the same reshape, not a recompute)."""
    from nerf_mae_tpu.ops.patchify import patchify_3d

    cfg = MAEConfig(
        swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                        num_heads=(3, 6, 12, 24)),
        resolution=32, compute_dtype="float32", remat=False)
    model = SwinMAE3D(cfg)
    rng = jax.random.PRNGKey(0)
    g = jax.random.uniform(rng, (2, 32, 32, 32, 4))
    params = model.init({"params": rng, "mask": rng}, g, True)
    tm = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 8)) > 0.5
    vox, _ = model.apply(params, g, True, token_mask=tm)
    pat, _ = model.apply(params, g, True, token_mask=tm, patched_pred=True)
    assert pat.shape == (2, 8, 8, 8, 64, 4)
    np.testing.assert_array_equal(
        np.asarray(pat), np.asarray(patchify_3d(vox, 4)))
    # and the loss is identical through either form
    sizes = jnp.full((2, 3), 32, jnp.int32)
    l1, _ = mae_loss(vox, g, tm, sizes, cfg)
    l2, _ = mae_loss(pat, g, tm, sizes, cfg)
    np.testing.assert_allclose(float(l1), float(l2), rtol=0, atol=0)


@pytest.mark.quick
def test_config_rejects_unaligned_resolution():
    """UNETR skip alignment: resolution must divide by patch*2^(stages-1)
    or construction fails with a clear error (not a deep concat crash)."""
    for ok in (32, 64, 96, 160):
        MAEConfig(swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                                  num_heads=(3, 6, 12, 24)), resolution=ok)
    for bad in (16, 48, 80):
        with pytest.raises(ValueError, match="multiple of 32"):
            MAEConfig(swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                                      num_heads=(3, 6, 12, 24)),
                      resolution=bad)


# mid tier: ~70 s compile of both embed paths (VERDICT r3 weak #4)
class TestPatchMajorInput:
    """Patch-major input fast path: host-patchified input through the
    dense patch embed must match the voxel-conv path with the SAME params
    (one kernel/bias tree serves both — checkpoint interop)."""

    def test_forward_and_loss_match_voxel_path(self):
        from nerf_mae_tpu.ops.patchify import patchify_np

        cfg = tiny_cfg()
        model = SwinMAE3D(cfg)
        rng = jax.random.PRNGKey(0)
        g = np.random.RandomState(0).rand(2, 32, 32, 32, 4).astype(np.float32)
        params = model.init({"params": rng, "mask": rng}, jnp.asarray(g), True)
        tm = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 8)) > 0.5
        sizes = jnp.array([[32, 32, 32], [28, 30, 32]])

        vox, _ = model.apply(params, jnp.asarray(g), True, token_mask=tm,
                             patched_pred=True)
        gp = patchify_np(g, 4)
        assert gp.shape == (2, 8, 8, 8, 64, 4)
        pat, _ = model.apply(params, jnp.asarray(gp), True, token_mask=tm,
                             patched_pred=True)
        np.testing.assert_allclose(np.asarray(pat), np.asarray(vox),
                                   rtol=1e-5, atol=1e-5)
        l_vox, _ = mae_loss(vox, jnp.asarray(g), tm, sizes, cfg)
        l_pat, _ = mae_loss(pat, jnp.asarray(gp), tm, sizes, cfg)
        np.testing.assert_allclose(float(l_pat), float(l_vox), rtol=1e-6)

        # channel-flat argument form [B,T,T,T,p^3*C] (the preferred TPU
        # jit-argument layout): bitwise-identical to the 6-D patched form
        # — the reshape is layout-only
        gf = gp.reshape(2, 8, 8, 8, -1)
        flat, _ = model.apply(params, jnp.asarray(gf), True, token_mask=tm,
                              patched_pred=True)
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(pat))
        l_flat, _ = mae_loss(flat, jnp.asarray(gf), tm, sizes, cfg)
        np.testing.assert_allclose(float(l_flat), float(l_pat), rtol=0)

    def test_patchify_np_matches_device_patchify(self):
        from nerf_mae_tpu.ops.patchify import patchify_3d, patchify_np

        x = np.random.RandomState(1).rand(1, 8, 8, 8, 4).astype(np.float32)
        np.testing.assert_array_equal(
            patchify_np(x, 4), np.asarray(patchify_3d(jnp.asarray(x), 4))
        )
