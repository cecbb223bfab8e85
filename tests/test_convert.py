"""Torch->JAX checkpoint conversion: layout rules (numeric, vs torch) and
param-tree structural match against SwinMAE3D.init."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "scripts")

from convert_torch_checkpoint import _conv, _convT, _lin, convert_state_dict

from nerf_mae_tpu.config import MAEConfig, SwinConfig
from nerf_mae_tpu.models.mae import SwinMAE3D


class TestLayoutRules:
    def test_conv3d(self):
        import flax.linen as nn
        import torch

        rs = np.random.RandomState(0)
        x = rs.randn(1, 4, 6, 6, 6).astype(np.float32)
        w = rs.randn(8, 4, 3, 3, 3).astype(np.float32)
        b = rs.randn(8).astype(np.float32)
        tout = torch.nn.functional.conv3d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1
        ).numpy()
        conv = nn.Conv(8, (3, 3, 3), padding="SAME")
        jout = conv.apply(
            {"params": {"kernel": jnp.asarray(_conv(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(jout).transpose(0, 4, 1, 2, 3), tout, atol=1e-4
        )

    def test_conv_transpose3d(self):
        import flax.linen as nn
        import torch

        rs = np.random.RandomState(1)
        x = rs.randn(1, 4, 5, 5, 5).astype(np.float32)
        w = rs.randn(4, 6, 2, 2, 2).astype(np.float32)
        b = rs.randn(6).astype(np.float32)
        tout = torch.nn.functional.conv_transpose3d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2
        ).numpy()
        ct = nn.ConvTranspose(6, (2, 2, 2), strides=(2, 2, 2), padding="VALID")
        jout = ct.apply(
            {"params": {"kernel": jnp.asarray(_convT(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(jout).transpose(0, 4, 1, 2, 3), tout, atol=1e-4
        )

    def test_linear(self):
        w = np.arange(6, dtype=np.float32).reshape(2, 3)
        np.testing.assert_array_equal(_lin(w), w.T)


def synthetic_state_dict(cfg: MAEConfig) -> dict:
    """Reference-named state_dict with correct shapes for a tiny config."""
    rs = np.random.RandomState(0)
    swin = cfg.swin
    e = swin.embed_dim
    sd = {
        "patch_partition.0.weight": rs.randn(e, 4, 4, 4, 4),
        "patch_partition.0.bias": rs.randn(e),
        "patch_partition.2.weight": rs.randn(e),
        "patch_partition.2.bias": rs.randn(e),
        "mask_token": rs.randn(e),
    }
    table = 7 * 7 * 7
    for s, depth in enumerate(swin.depths):
        dim = swin.stage_dims[s]
        off = 0
        if s > 0:
            prev = swin.stage_dims[s - 1]
            sd[f"stages.{s}.0.reduction.weight"] = rs.randn(2 * prev, 8 * prev)
            sd[f"stages.{s}.0.norm.weight"] = rs.randn(8 * prev)
            sd[f"stages.{s}.0.norm.bias"] = rs.randn(8 * prev)
            off = 1
        for b in range(depth):
            p = f"stages.{s}.{b + off}."
            h = swin.num_heads[s]
            sd[p + "norm1.weight"] = rs.randn(dim)
            sd[p + "norm1.bias"] = rs.randn(dim)
            sd[p + "norm2.weight"] = rs.randn(dim)
            sd[p + "norm2.bias"] = rs.randn(dim)
            sd[p + "attn.qkv.weight"] = rs.randn(3 * dim, dim)
            sd[p + "attn.qkv.bias"] = rs.randn(3 * dim)
            sd[p + "attn.proj.weight"] = rs.randn(dim, dim)
            sd[p + "attn.proj.bias"] = rs.randn(dim)
            sd[p + "attn.relative_position_bias_table"] = rs.randn(table, h)
            sd[p + "mlp.0.weight"] = rs.randn(4 * dim, dim)
            sd[p + "mlp.0.bias"] = rs.randn(4 * dim)
            sd[p + "mlp.3.weight"] = rs.randn(dim, 4 * dim)
            sd[p + "mlp.3.bias"] = rs.randn(dim)
    for d, (cin, cout) in zip((4, 3, 2), [(8 * e, 4 * e), (4 * e, 2 * e), (2 * e, e)]):
        p = f"decoder{d}."
        sd[p + "transp_conv.weight"] = rs.randn(cin, cout, 2, 2, 2)
        sd[p + "transp_conv.bias"] = rs.randn(cout)
        sd[p + "conv_block.conv1.weight"] = rs.randn(cout, 2 * cout, 3, 3, 3)
        sd[p + "conv_block.conv1.bias"] = rs.randn(cout)
        sd[p + "conv_block.conv2.weight"] = rs.randn(cout, cout, 3, 3, 3)
        sd[p + "conv_block.conv2.bias"] = rs.randn(cout)
        sd[p + "conv_block.conv3.weight"] = rs.randn(cout, 2 * cout, 1, 1, 1)
        sd[p + "conv_block.conv3.bias"] = rs.randn(cout)
    sd["decoder1.transp_conv.weight"] = rs.randn(e, e // 2, 4, 4, 4)
    sd["decoder1.transp_conv.bias"] = rs.randn(e // 2)
    sd["decoder1.conv_block.conv1.weight"] = rs.randn(e // 2, e // 2, 3, 3, 3)
    sd["decoder1.conv_block.conv1.bias"] = rs.randn(e // 2)
    sd["decoder1.conv_block.conv2.weight"] = rs.randn(e // 2, e // 2, 3, 3, 3)
    sd["decoder1.conv_block.conv2.bias"] = rs.randn(e // 2)
    sd["out.conv.weight"] = rs.randn(4, e // 2, 1, 1, 1)
    sd["out.conv.bias"] = rs.randn(4)
    return sd


class TestConvertTree:
    def test_structure_matches_init(self):
        cfg = MAEConfig(
            swin=SwinConfig(embed_dim=12, depths=(1, 1, 1, 1),
                            num_heads=(3, 6, 12, 24)),
            resolution=32, compute_dtype="float32", remat=False,
            decoder_type="unetr",
        )
        sd = synthetic_state_dict(cfg)
        params = convert_state_dict(sd, cfg.swin.depths)

        model = SwinMAE3D(cfg)
        rng = jax.random.PRNGKey(0)
        ref = model.init(
            {"params": rng, "mask": rng}, jnp.zeros((1, 32, 32, 32, 4)), True
        )["params"]

        ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
        got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
        ref_map = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
        got_map = {jax.tree_util.keystr(k): v.shape for k, v in got_flat}
        assert ref_map == got_map

        # converted params actually run a forward pass
        pred, _ = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.zeros((1, 32, 32, 32, 4)), True,
            rngs={"mask": rng},
        )
        assert pred.shape == (1, 32, 32, 32, 4)
        assert np.isfinite(np.asarray(pred)).all()
