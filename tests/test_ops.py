"""Unit tests for core ops: pos embed, patchify, masking, window attention.

Oracles are independent numpy implementations (naive per-window attention),
never the reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.ops import (
    block_mask_3d,
    patchify_3d,
    relative_position_index_3d,
    shifted_window_mask,
    sincos_pos_embed_3d,
    unpatchify_3d,
    voxel_validity_mask,
    window_attention_3d,
    window_partition_3d,
    window_unpartition_3d,
)

pytestmark = pytest.mark.quick


class TestPosEmbed:
    def test_shape_and_finite(self):
        pe = sincos_pos_embed_3d(96, 10)
        assert pe.shape == (1, 10, 10, 10, 96)
        assert np.isfinite(pe).all()

    def test_matches_manual_formula(self):
        # axis order: first third encodes axis-1 (w), second axis-0 (h),
        # third axis-2 (l) — reference meshgrid-"xy" convention
        pe = sincos_pos_embed_3d(96, 6)[0]
        d = 32
        omega = 1.0 / 10000 ** (np.arange(16) / 16.0)
        h, w, l = 3, 5, 2
        expected_w = np.concatenate([np.sin(w * omega), np.cos(w * omega)])
        expected_h = np.concatenate([np.sin(h * omega), np.cos(h * omega)])
        expected_l = np.concatenate([np.sin(l * omega), np.cos(l * omega)])
        np.testing.assert_allclose(pe[h, w, l, :d], expected_w, rtol=1e-5)
        np.testing.assert_allclose(pe[h, w, l, d : 2 * d], expected_h, rtol=1e-5)
        np.testing.assert_allclose(pe[h, w, l, 2 * d :], expected_l, rtol=1e-5)

    def test_non_divisible_dim_zero_padded(self):
        pe = sincos_pos_embed_3d(128, 4)  # swin_b: 128 % 3 != 0
        assert pe.shape[-1] == 128
        assert (pe[..., 126:] == 0).all()


class TestPatchify:
    def test_roundtrip(self):
        x = np.random.RandomState(0).randn(2, 8, 8, 8, 4).astype(np.float32)
        p = patchify_3d(jnp.asarray(x), 4)
        assert p.shape == (2, 2, 2, 2, 64, 4)
        back = unpatchify_3d(p, 4)
        np.testing.assert_array_equal(np.asarray(back), x)

    def test_patch_contents(self):
        x = np.arange(2 * 4 * 4 * 4 * 1).reshape(1, 4, 4, 4, 2).astype(np.float32)
        p = np.asarray(patchify_3d(jnp.asarray(x), 2))
        # patch (1,0,1) should contain voxels h in {2,3}, w in {0,1}, d in {2,3}
        expected = x[0, 2:4, 0:2, 2:4, :].reshape(8, 2)
        np.testing.assert_array_equal(p[0, 1, 0, 1], expected)

    def test_validity_mask(self):
        sizes = jnp.array([[3, 8, 5], [8, 8, 8]])
        m = np.asarray(voxel_validity_mask(sizes, 8))
        assert m.shape == (2, 8, 8, 8)
        assert m[0].sum() == 3 * 8 * 5
        assert m[1].all()
        assert m[0, 2, 7, 4] and not m[0, 3, 0, 0] and not m[0, 0, 0, 5]


class TestMasking:
    def test_ratio_and_block_structure(self):
        rng = jax.random.PRNGKey(0)
        mask = np.asarray(block_mask_3d(rng, 4, 40, block=4, p_remove=0.75))
        assert mask.shape == (4, 40, 40, 40)
        ratio = mask.mean()
        assert 0.65 < ratio < 0.85
        # every 4^3 block is constant
        blocks = mask.reshape(4, 10, 4, 10, 4, 10, 4)
        per_block = blocks.transpose(0, 1, 3, 5, 2, 4, 6).reshape(4, 1000, 64)
        assert ((per_block.min(-1) == per_block.max(-1))).all()

    def test_per_sample_vs_shared(self):
        rng = jax.random.PRNGKey(1)
        per = np.asarray(block_mask_3d(rng, 3, 16, per_sample=True))
        assert not (per[0] == per[1]).all() or not (per[1] == per[2]).all()
        shared = np.asarray(block_mask_3d(rng, 3, 16, per_sample=False))
        assert (shared[0] == shared[1]).all() and (shared[1] == shared[2]).all()

    def test_grid_strategy(self):
        mask = np.asarray(
            block_mask_3d(jax.random.PRNGKey(0), 2, 16, block=4, strategy="grid")
        )
        assert abs(mask.mean() - 0.25) < 1e-6
        assert (mask[0] == mask[1]).all()


def naive_window_attention(x, qkv_k, qkv_b, proj_k, proj_b, table, window, shift, heads):
    """Independent numpy oracle: loop over windows, plain softmax attention."""
    b, H, W, D, C = x.shape
    hd = C // heads
    if sum(shift):
        x = np.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    idx = relative_position_index_3d(tuple(window))
    rel = table[idx]  # [N, N, heads]
    region = np.zeros((H, W, D))
    if sum(shift):
        cnt = 0
        for hs in [(0, H - window[0]), (H - window[0], H - shift[0]), (H - shift[0], H)]:
            for ws in [(0, W - window[1]), (W - window[1], W - shift[1]), (W - shift[1], W)]:
                for ds in [(0, D - window[2]), (D - window[2], D - shift[2]), (D - shift[2], D)]:
                    region[hs[0]:hs[1], ws[0]:ws[1], ds[0]:ds[1]] = cnt
                    cnt += 1
    out = np.zeros_like(x)
    for bi in range(b):
        for i0 in range(0, H, window[0]):
            for j0 in range(0, W, window[1]):
                for k0 in range(0, D, window[2]):
                    blk = x[bi, i0:i0+window[0], j0:j0+window[1], k0:k0+window[2]]
                    reg = region[i0:i0+window[0], j0:j0+window[1], k0:k0+window[2]].reshape(-1)
                    toks = blk.reshape(-1, C)
                    qkv = toks @ qkv_k + qkv_b
                    q, k, v = np.split(qkv, 3, axis=-1)
                    o = np.zeros_like(toks)
                    for hh in range(heads):
                        qs = q[:, hh*hd:(hh+1)*hd] * hd**-0.5
                        ks = k[:, hh*hd:(hh+1)*hd]
                        vs = v[:, hh*hd:(hh+1)*hd]
                        a = qs @ ks.T + rel[:, :, hh]
                        a = a + np.where(reg[None, :] != reg[:, None], -100.0, 0.0)
                        a = np.exp(a - a.max(-1, keepdims=True))
                        a /= a.sum(-1, keepdims=True)
                        o[:, hh*hd:(hh+1)*hd] = a @ vs
                    o = o @ proj_k + proj_b
                    out[bi, i0:i0+window[0], j0:j0+window[1], k0:k0+window[2]] = o.reshape(*window, C)
    if sum(shift):
        out = np.roll(out, shift, axis=(1, 2, 3))
    return out


class TestWindowAttention:
    def test_partition_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 4, 8, 3))
        xw, counts = window_partition_3d(x, (4, 4, 4))
        assert xw.shape == (2, 2 * 1 * 2, 64, 3)
        back = window_unpartition_3d(xw, (4, 4, 4), counts)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = relative_position_index_3d((2, 2, 2))
        assert idx.shape == (8, 8)
        assert idx.min() >= 0 and idx.max() < 27
        # self-pairs map to the center entry, identical for all tokens
        center = idx[0, 0]
        assert (np.diag(idx) == center).all()
        # symmetry: idx[i,j] + idx[j,i] should mirror around center
        assert idx[0, 7] + idx[7, 0] == 2 * center

    def test_shift_mask_regions(self):
        m = shifted_window_mask((8, 8, 8), (4, 4, 4), (2, 2, 2))
        assert m.shape == (8, 64, 64)
        # the first window (interior, away from wrap) is fully unmasked
        assert (m[0] == 0).all()
        # the last window (corner, all wrapped regions meet) has masked pairs
        assert (m[-1] == -100).any()
        assert shifted_window_mask((8, 8, 8), (4, 4, 4), (0, 0, 0)) is None

    @pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
    def test_matches_naive_oracle(self, shift):
        rs = np.random.RandomState(42)
        heads, C = 2, 8
        window = (4, 4, 4)
        x = rs.randn(2, 8, 8, 8, C).astype(np.float32)
        qkv_k = (rs.randn(C, 3 * C) * 0.1).astype(np.float32)
        qkv_b = (rs.randn(3 * C) * 0.1).astype(np.float32)
        proj_k = (rs.randn(C, C) * 0.1).astype(np.float32)
        proj_b = (rs.randn(C) * 0.1).astype(np.float32)
        table = (rs.randn(7 * 7 * 7, heads) * 0.1).astype(np.float32)
        got = np.asarray(
            window_attention_3d(
                jnp.asarray(x), jnp.asarray(qkv_k), jnp.asarray(qkv_b),
                jnp.asarray(proj_k), jnp.asarray(proj_b), jnp.asarray(table),
                window, shift, heads,
            )
        )
        want = naive_window_attention(
            x, qkv_k, qkv_b, proj_k, proj_b, table, window, shift, heads
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_pads_non_divisible_grid(self):
        rs = np.random.RandomState(0)
        C, heads = 4, 2
        x = jnp.asarray(rs.randn(1, 5, 6, 7, C).astype(np.float32))
        out = window_attention_3d(
            x,
            jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) * 0.1),
            jnp.zeros(3 * C),
            jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.1),
            jnp.zeros(C),
            jnp.asarray(rs.randn(343, heads).astype(np.float32) * 0.1),
            (4, 4, 4), (2, 2, 2), heads,
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
