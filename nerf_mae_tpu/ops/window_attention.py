"""3D shifted-window multi-head attention, TPU-native.

Functionally equivalent to the reference's shifted_window_attention
(reference: nerf_mae/model/mae/swin_mae3d.py:27-197) but designed for XLA:

  * window partition/merge are pure reshapes+transposes of a static-shape
    [B, H, W, D, C] tensor — XLA fuses them into the surrounding matmuls
  * the 27-region shift mask and the relative-position index are *static*
    functions of (grid, window, shift); we precompute them with numpy at
    trace time and bake them in as constants, instead of rebuilding tensors
    on-device every call like the reference does
  * attention runs as one batched [B*nW, heads, N, N] matmul pair on the MXU
    with fp32 accumulation; softmax in fp32

The per-window token count N = prod(window) is 64 for the standard 4^3
window, so attention cost is linear in volume — no global attention ever
materializes (this is the reference's scalability story, kept intact).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition_3d(
    x: jnp.ndarray, window: Sequence[int]
) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """[B, H, W, D, C] -> ([B, nW, N, C], windows-per-axis). H/W/D must divide."""
    b, h, w, d, c = x.shape
    nh, nw, nd = h // window[0], w // window[1], d // window[2]
    x = x.reshape(b, nh, window[0], nw, window[1], nd, window[2], c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    x = x.reshape(b, nh * nw * nd, window[0] * window[1] * window[2], c)
    return x, (nh, nw, nd)


def window_unpartition_3d(
    x: jnp.ndarray, window: Sequence[int], counts: Tuple[int, int, int]
) -> jnp.ndarray:
    """Inverse of window_partition_3d: [B, nW, N, C] -> [B, H, W, D, C]."""
    b, _, _, c = x.shape
    nh, nw, nd = counts
    x = x.reshape(b, nh, nw, nd, window[0], window[1], window[2], c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, nh * window[0], nw * window[1], nd * window[2], c)


@functools.lru_cache(maxsize=32)
def relative_position_index_3d(window: Tuple[int, int, int]) -> np.ndarray:
    """[N, N] int32 index into the (2w0-1)(2w1-1)(2w2-1) bias table.

    Same row-major arithmetic as the reference
    (reference: swin_mae3d.py:257-280).
    """
    coords = np.stack(
        np.meshgrid(
            np.arange(window[0]),
            np.arange(window[1]),
            np.arange(window[2]),
            indexing="ij",
        )
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += window[0] - 1
    rel[..., 1] += window[1] - 1
    rel[..., 2] += window[2] - 1
    rel[..., 0] *= (2 * window[1] - 1) * (2 * window[2] - 1)
    rel[..., 1] *= 2 * window[2] - 1
    return rel.sum(-1).astype(np.int32)


def _region_slices(dim: int, w: int, s: int):
    """The three shift regions along one axis (reference: swin_mae3d.py:127-141)."""
    return ((0, dim - w), (dim - w, dim - s), (dim - s, dim))


@functools.lru_cache(maxsize=64)
def shifted_window_mask(
    grid: Tuple[int, int, int],
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> Optional[np.ndarray]:
    """[nW, N, N] float32 additive mask (0 / -100) for shifted windows.

    After the cyclic shift, tokens wrapped from opposite grid edges share a
    window; pairs from different 27-region labels must not attend
    (reference: swin_mae3d.py:124-167). Returns None when no shift.
    """
    if sum(shift) == 0:
        return None
    region = np.zeros(grid, dtype=np.float32)
    count = 0
    for hs in _region_slices(grid[0], window[0], shift[0]):
        for ws in _region_slices(grid[1], window[1], shift[1]):
            for ds in _region_slices(grid[2], window[2], shift[2]):
                region[hs[0] : hs[1], ws[0] : ws[1], ds[0] : ds[1]] = count
                count += 1
    nh, nw, nd = (grid[i] // window[i] for i in range(3))
    r = region.reshape(nh, window[0], nw, window[1], nd, window[2])
    r = r.transpose(0, 2, 4, 1, 3, 5).reshape(nh * nw * nd, -1)  # [nW, N]
    diff = r[:, :, None] - r[:, None, :]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


def window_attention_3d(
    x: jnp.ndarray,
    qkv_kernel: jnp.ndarray,  # [C, 3C]
    qkv_bias: Optional[jnp.ndarray],  # [3C]
    proj_kernel: jnp.ndarray,  # [C, C]
    proj_bias: Optional[jnp.ndarray],  # [C]
    bias_table: jnp.ndarray,  # [(2w-1)^3, heads]
    window: Sequence[int],
    shift: Sequence[int],
    num_heads: int,
) -> jnp.ndarray:
    """Shifted-window MSA over a [B, H, W, D, C] grid. Returns same shape.

    All shape logic (padding to window multiples, disabling shift on small
    grids) is resolved statically at trace time.
    """
    b, h, w, d, c = x.shape
    window = tuple(window)
    pad = tuple((window[i] - (h, w, d)[i] % window[i]) % window[i] for i in range(3))
    if any(pad):
        x = jnp.pad(x, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)))
    ph, pw, pd = h + pad[0], w + pad[1], d + pad[2]
    # no shift along axes the window fully covers (reference: swin_mae3d.py:69-75)
    shift = tuple(
        0 if window[i] >= (ph, pw, pd)[i] else shift[i] for i in range(3)
    )

    if sum(shift) > 0:
        x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))

    xw, counts = window_partition_3d(x, window)  # [B, nW, N, C]
    n_tokens = xw.shape[2]
    head_dim = c // num_heads

    qkv = jnp.einsum(
        "bwnc,cd->bwnd", xw, qkv_kernel, preferred_element_type=jnp.float32
    )
    if qkv_bias is not None:
        qkv = qkv + qkv_bias
    qkv = qkv.astype(x.dtype)
    qkv = qkv.reshape(b, counts[0] * counts[1] * counts[2], n_tokens, 3, num_heads, head_dim)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    # -> [B, nW, heads, N, hd]
    q = q.transpose(0, 1, 3, 2, 4) * (head_dim**-0.5)
    k = k.transpose(0, 1, 3, 2, 4)
    v = v.transpose(0, 1, 3, 2, 4)

    attn = jnp.einsum(
        "bwhnk,bwhmk->bwhnm", q, k, preferred_element_type=jnp.float32
    )

    rel_idx = jnp.asarray(relative_position_index_3d(window))
    rel_bias = bias_table[rel_idx]  # [N, N, heads]
    attn = attn + rel_bias.transpose(2, 0, 1)[None, None].astype(attn.dtype)

    shift_mask = shifted_window_mask((ph, pw, pd), window, tuple(shift))
    if shift_mask is not None:
        attn = attn + jnp.asarray(shift_mask)[None, :, None, :, :]

    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bwhnm,bwhmk->bwhnk", attn, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, -1, n_tokens, c)
    out = jnp.einsum(
        "bwnc,cd->bwnd", out, proj_kernel, preferred_element_type=jnp.float32
    )
    if proj_bias is not None:
        out = out + proj_bias
    out = out.astype(x.dtype)

    x = window_unpartition_3d(out, window, counts)
    if sum(shift) > 0:
        x = jnp.roll(x, shift, axis=(1, 2, 3))
    if any(pad):
        x = x[:, :h, :w, :d, :]
    return x
