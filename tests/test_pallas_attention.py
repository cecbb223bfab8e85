"""Fused Pallas window attention vs the XLA reference path (interpret mode
on CPU), including gradients through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.ops.pallas_attention import (
    fused_window_attention,
    pallas_supported,
)
from nerf_mae_tpu.ops.window_attention import window_attention_3d


def make_params(rs, c, heads):
    return dict(
        qkv_kernel=jnp.asarray(rs.randn(c, 3 * c).astype(np.float32) * 0.1),
        qkv_bias=jnp.asarray(rs.randn(3 * c).astype(np.float32) * 0.1),
        proj_kernel=jnp.asarray(rs.randn(c, c).astype(np.float32) * 0.1),
        proj_bias=jnp.asarray(rs.randn(c).astype(np.float32) * 0.1),
        bias_table=jnp.asarray(rs.randn(343, heads).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_matches_xla_path(shift):
    rs = np.random.RandomState(0)
    c, heads = 16, 2
    x = jnp.asarray(rs.randn(2, 8, 8, 8, c).astype(np.float32))
    p = make_params(rs, c, heads)
    got = fused_window_attention(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["bias_table"], (4, 4, 4), shift, heads,
    )
    want = window_attention_3d(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["bias_table"], (4, 4, 4), shift, heads,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_gradients_match(shift=(2, 2, 2)):
    rs = np.random.RandomState(1)
    c, heads = 8, 2
    x = jnp.asarray(rs.randn(1, 4, 4, 8, c).astype(np.float32))
    p = make_params(rs, c, heads)
    args = (x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"],
            p["proj_bias"], p["bias_table"])

    def loss_fused(*a):
        return (fused_window_attention(*a, (4, 4, 4), shift, heads) ** 2).sum()

    def loss_xla(*a):
        return (window_attention_3d(*a, (4, 4, 4), shift, heads) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_xla, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad argnum {i}",
        )


def test_gradients_match_padded_grid():
    rs = np.random.RandomState(2)
    c, heads = 8, 2
    x = jnp.asarray(rs.randn(1, 6, 6, 6, c).astype(np.float32))
    p = make_params(rs, c, heads)
    args = (x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"],
            p["proj_bias"], p["bias_table"])
    g1 = jax.grad(
        lambda *a: (fused_window_attention(*a, (4, 4, 4), (2, 2, 2), heads) ** 2).sum(),
        argnums=tuple(range(6)),
    )(*args)
    g2 = jax.grad(
        lambda *a: (window_attention_3d(*a, (4, 4, 4), (2, 2, 2), heads) ** 2).sum(),
        argnums=tuple(range(6)),
    )(*args)
    for i, (a, b) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3,
            err_msg=f"grad argnum {i}",
        )


def test_supported_predicate():
    assert pallas_supported((1, 8, 8, 8, 16), (4, 4, 4), (0, 0, 0))
    # non-divisible grids are handled by padding
    assert pallas_supported((1, 5, 8, 8, 16), (4, 4, 4), (0, 0, 0))


@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_padded_grid_matches_xla(shift):
    # 10^3 grid (swin stage-2 shape class): window 4 requires padding
    rs = np.random.RandomState(3)
    c, heads = 16, 4
    x = jnp.asarray(rs.randn(2, 10, 10, 10, c).astype(np.float32))
    p = make_params(rs, c, heads)
    got = fused_window_attention(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["bias_table"], (4, 4, 4), shift, heads,
    )
    want = window_attention_3d(
        x, p["qkv_kernel"], p["qkv_bias"], p["proj_kernel"], p["proj_bias"],
        p["bias_table"], (4, 4, 4), shift, heads,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_model_forced_pallas_matches_xla():
    """Whole SwinEncoder3D with attention_impl pallas vs xla."""
    from nerf_mae_tpu.config import SwinConfig
    from nerf_mae_tpu.models.swin import SwinEncoder3D

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 8, 8, 8, 12).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = SwinConfig(
            embed_dim=12, depths=(2,), num_heads=(3,),
            stochastic_depth_prob=0.0, attention_impl=impl,
        )
        model = SwinEncoder3D(cfg=cfg, dtype=jnp.float32)
        params = model.init({"params": rng}, x, True)["params"]
        outs[impl] = np.asarray(model.apply({"params": params}, x, True)[0])
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=2e-3, atol=2e-3)
