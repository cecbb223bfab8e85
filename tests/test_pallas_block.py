"""Fused whole-Swin-block Pallas kernel vs the XLA composition.

Runs in interpret mode on CPU (tests/conftest.py forces the cpu backend);
the same kernel code compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.models.swin import SwinBlock3D
from nerf_mae_tpu.ops.pallas_block import (
    fused_block_supported,
    fused_swin_block,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU


def _params(key, c, heads, hidden, table):
    ks = jax.random.split(key, 8)
    n01 = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.05
    return dict(
        ln1_scale=1.0 + n01(ks[0], (c,)),
        ln1_bias=n01(ks[1], (c,)),
        qkv_kernel=n01(ks[2], (c, 3 * c)),
        qkv_bias=n01(ks[3], (3 * c,)),
        proj_kernel=n01(ks[4], (c, c)),
        proj_bias=n01(ks[5], (c,)),
        ln2_scale=1.0 + n01(ks[6], (c,)),
        ln2_bias=n01(ks[7], (c,)),
        fc1_kernel=n01(ks[0], (c, hidden)),
        fc1_bias=n01(ks[1], (hidden,)),
        fc2_kernel=n01(ks[2], (hidden, c)),
        fc2_bias=n01(ks[3], (c,)),
        bias_table=n01(ks[4], (table, heads)),
    )


def _xla_block(x, p, window, shift, heads, eps, keep_attn, keep_mlp):
    """The reference composition (SwinBlock3D's XLA path) as a function."""
    from nerf_mae_tpu.models.swin import _dense, layer_norm
    from nerf_mae_tpu.ops.window_attention import window_attention_3d

    d = x.dtype
    h = layer_norm(x, p["ln1_scale"], p["ln1_bias"], eps)
    h = window_attention_3d(
        h.astype(d), p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"],
        p["proj_bias"], p["bias_table"], window, shift, heads,
    )
    ka = keep_attn.reshape(-1, 1, 1, 1, 1).astype(d)
    x = x + h.astype(d) * ka
    h = layer_norm(x, p["ln2_scale"], p["ln2_bias"], eps)
    h = _dense(h, p["fc1_kernel"], p["fc1_bias"], d)
    h = jax.nn.gelu(h)
    h = _dense(h, p["fc2_kernel"], p["fc2_bias"], d)
    km = keep_mlp.reshape(-1, 1, 1, 1, 1).astype(d)
    return x + h.astype(d) * km


def _fused(x, p, window, shift, heads, eps, keep_attn, keep_mlp):
    return fused_swin_block(
        x, p["ln1_scale"], p["ln1_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"], p["ln2_scale"], p["ln2_bias"],
        p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"],
        p["bias_table"], keep_attn, keep_mlp, window, shift, heads, eps,
    )


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_fused_block_forward_matches_xla(shift):
    window, heads, c, eps = (4, 4, 4), 4, 32, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, c), jnp.float32)
    p = _params(jax.random.PRNGKey(1), c, heads, c * 4, 7 ** 3)
    ones = jnp.ones((2,), jnp.float32)
    got = _fused(x, p, window, shift, heads, eps, ones, ones)
    want = _xla_block(x, p, window, shift, heads, eps, ones, ones)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_droppath_keeps():
    """Per-sample keep factors scale the branches exactly like drop_path."""
    window, heads, c, eps = (4, 4, 4), 2, 16, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 4, 8, c), jnp.float32)
    p = _params(jax.random.PRNGKey(3), c, heads, c * 4, 7 ** 3)
    ka = jnp.array([0.0, 2.0, 1.0], jnp.float32)
    km = jnp.array([2.0, 0.0, 1.0], jnp.float32)
    got = _fused(x, p, window, (0, 0, 0), heads, eps, ka, km)
    want = _xla_block(x, p, window, (0, 0, 0), heads, eps, ka, km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_fused_block_grads_match_xla(shift):
    window, heads, c, eps = (4, 4, 4), 4, 32, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8, c), jnp.float32)
    p = _params(jax.random.PRNGKey(5), c, heads, c * 4, 7 ** 3)
    w = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)
    ka = jnp.array([1.25, 0.0], jnp.float32)
    km = jnp.array([1.25, 1.25], jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(_fused(x, p, window, shift, heads, eps, ka, km) * w)

    def loss_xla(x, p):
        return jnp.sum(_xla_block(x, p, window, shift, heads, eps, ka, km) * w)

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx2, gp2 = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-4)
    for k in gp1:
        np.testing.assert_allclose(
            np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"param grad mismatch: {k}",
        )


def test_fused_block_supported_predicate(monkeypatch):
    import nerf_mae_tpu.ops.pallas_block as pb

    w = (4, 4, 4)
    assert fused_block_supported((1, 8, 8, 8, 128), w, 4, 4.0)
    assert fused_block_supported((1, 40, 40, 40, 256), w, 8, 4.0)
    # C=1024 weight-grad accumulators exceed VMEM either way
    assert not fused_block_supported((1, 5, 5, 5, 1024), w, 32, 4.0)
    # large-C mode: the C=512 stage and non-divisible (padded) grids route
    monkeypatch.setattr(pb, "LARGE_C_ENABLED", True)
    assert fused_block_supported((1, 10, 10, 10, 512), w, 16, 4.0)
    assert fused_block_supported((1, 10, 10, 10, 128), w, 4, 4.0)
    # conservative mode: divisible + C<=256 only
    monkeypatch.setattr(pb, "LARGE_C_ENABLED", False)
    assert not fused_block_supported((1, 10, 10, 10, 512), w, 16, 4.0)
    assert not fused_block_supported((1, 10, 10, 10, 128), w, 4, 4.0)


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_fused_block_padded_matches_xla(shift):
    """Non-divisible grid (6^3 with a 4^3 window -> pad to 8^3): the
    in-kernel pad_mask must reproduce the XLA LN-before-pad semantics,
    forward AND grads (stage-2 topology at tiny scale)."""
    window, heads, c, eps = (4, 4, 4), 4, 32, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 6, 6, 6, c), jnp.float32)
    p = _params(jax.random.PRNGKey(10), c, heads, c * 4, 7 ** 3)
    w = jax.random.normal(jax.random.PRNGKey(11), x.shape, jnp.float32)
    ka = jnp.array([1.25, 1.0], jnp.float32)
    km = jnp.array([1.0, 1.25], jnp.float32)

    got = _fused(x, p, window, shift, heads, eps, ka, km)
    want = _xla_block(x, p, window, shift, heads, eps, ka, km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        return jnp.sum(_fused(x, p, window, shift, heads, eps, ka, km) * w)

    def loss_xla(x, p):
        return jnp.sum(_xla_block(x, p, window, shift, heads, eps, ka, km) * w)

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx2, gp2 = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-4)
    for k in gp1:
        np.testing.assert_allclose(
            np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"param grad mismatch: {k}",
        )


def test_module_level_fused_equals_xla():
    """SwinBlock3D with attention_impl='pallas' (fused block path on a
    divisible grid) matches attention_impl='xla' with identical params."""
    kw = dict(dim=32, num_heads=4, window=(4, 4, 4), shift=(2, 2, 2),
              dtype=jnp.float32)
    mod_f = SwinBlock3D(attention_impl="pallas", **kw)
    mod_x = SwinBlock3D(attention_impl="xla", **kw)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8, 32), jnp.float32)
    params = mod_x.init(jax.random.PRNGKey(8), x)["params"]
    out_f = mod_f.apply({"params": params}, x)
    out_x = mod_x.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_odd_window_count_shifted():
    """3 windows/sample (odd): the shifted block packs via the flat-tiled
    shift mask (batch*nW = 6 windows, wp=2); fwd + grads must match XLA."""
    window, heads, c, eps = (4, 4, 4), 4, 32, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 4, 12, c),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(13), c, heads, c * 4, 7 ** 3)
    w = jax.random.normal(jax.random.PRNGKey(14), x.shape, jnp.float32)
    ones = jnp.ones((2,), jnp.float32)

    got = _fused(x, p, window, (2, 2, 2), heads, eps, ones, ones)
    want = _xla_block(x, p, window, (2, 2, 2), heads, eps, ones, ones)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        return jnp.sum(_fused(x, p, window, (2, 2, 2), heads, eps, ones,
                              ones) * w)

    def loss_xla(x, p):
        return jnp.sum(_xla_block(x, p, window, (2, 2, 2), heads, eps, ones,
                                  ones) * w)

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx2, gp2 = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-4)
    for k in gp1:
        np.testing.assert_allclose(
            np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"param grad mismatch: {k}",
        )


def test_fused_block_unshifted_groups_cross_samples():
    """Unshifted blocks group windows over the flat batch*nW axis (3
    windows/sample, batch 2 -> wp=2 packs windows of different samples in
    one tile); per-sample droppath keeps must still land on the right
    rows, fwd and grads."""
    window, heads, c, eps = (4, 4, 4), 4, 32, 1e-5
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 4, 4, 12, c),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(16), c, heads, c * 4, 7 ** 3)
    w = jax.random.normal(jax.random.PRNGKey(17), x.shape, jnp.float32)
    ka = jnp.array([1.25, 0.75], jnp.float32)  # distinct per sample
    km = jnp.array([0.5, 1.5], jnp.float32)

    got = _fused(x, p, window, (0, 0, 0), heads, eps, ka, km)
    want = _xla_block(x, p, window, (0, 0, 0), heads, eps, ka, km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        return jnp.sum(_fused(x, p, window, (0, 0, 0), heads, eps, ka,
                              km) * w)

    def loss_xla(x, p):
        return jnp.sum(_xla_block(x, p, window, (0, 0, 0), heads, eps, ka,
                                  km) * w)

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx2, gp2 = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-4)
    for k in gp1:
        np.testing.assert_allclose(
            np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"param grad mismatch: {k}",
        )
