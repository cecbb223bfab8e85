"""Fused 3D window attention as a Pallas TPU kernel.

The XLA path (ops/window_attention.py) materializes qkv ([B, nW, 64, 3C]
fp32), fp32 attention logits, and softmax intermediates in HBM per Swin
block. This kernel keeps all of them in VMEM: each grid program loads a
group of windows' tokens, computes qkv projection, per-window scaled
dot-product with relative-position bias (+ shift mask), softmax, value
contraction, and the output projection, then writes only the final tokens.

Layout notes (TPU tiling requires the last two block dims be (8k, 128m) or
equal to the array dims): windows are pre-partitioned in XLA to
[B * nW, N, C] (one fused transpose), the kernel blocks over groups of
WP windows, and the per-window token count N=64 lands on the sublane dim.
Grouping WP windows also feeds the MXU [WP*64, C] x [C, 3C] matmuls
instead of thin 64-row ones.

Scope: forward only. The backward pass reuses the pure-JAX implementation's
VJP via jax.custom_vjp — with remat enabled the jnp forward is recomputed
during backward anyway, so training loses nothing while the forward (and
all of inference/eval) takes the fused path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_mae_tpu.ops.window_attention import (
    relative_position_index_3d,
    shifted_window_mask,
    window_attention_3d,
    window_partition_3d,
    window_unpartition_3d,
)


def _pick_group(n_windows: int, num_heads: int) -> int:
    """Windows per program: feed the MXU bigger qkv/proj matmuls, but cap
    the unrolled per-head attention loop (compile time / code size)."""
    for wp in (8, 5, 4, 3, 2):
        if n_windows % wp == 0 and wp * num_heads <= 64:
            return wp
    return 1


def _fused_window_attn_kernel(
    x_ref,  # [WP, N, C] tokens of WP windows
    qkv_w_ref,  # [C, 3C]
    qkv_b_ref,  # [1, 3C]
    proj_w_ref,  # [C, C]
    proj_b_ref,  # [1, C]
    bias_ref,  # [WP, heads, N, N]
    out_ref,  # [WP, N, C]
    *,
    num_heads: int,
):
    """Mosaic-friendly structure: the only reshape merges leading dims; the
    per-head/per-window attention uses static lane slices + 2D matmuls
    (Mosaic rejects reshapes that split the minor dim and >1 matmul batch
    dim)."""
    wp, n, c = x_ref.shape
    hd = c // num_heads
    scale = hd ** -0.5
    x = x_ref[...].reshape(wp * n, c)  # leading-dim merge: supported

    qkv = (
        jnp.dot(x, qkv_w_ref[...], preferred_element_type=jnp.float32)
        + qkv_b_ref[...]
    )  # [WP*N, 3C] fp32, VMEM-resident

    outs = []
    for w in range(wp):  # static unroll
        rows = slice(w * n, (w + 1) * n)
        head_outs = []
        for h in range(num_heads):  # static unroll
            q = qkv[rows, h * hd:(h + 1) * hd] * scale  # [N, hd]
            k = qkv[rows, c + h * hd: c + (h + 1) * hd]
            v = qkv[rows, 2 * c + h * hd: 2 * c + (h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N]
            logits = logits + bias_ref[w, h]
            p = jax.nn.softmax(logits, axis=-1)
            head_outs.append(
                jnp.dot(p, v, preferred_element_type=jnp.float32)
            )  # [N, hd]
        outs.append(jnp.concatenate(head_outs, axis=-1))  # [N, C]
    o = jnp.concatenate(outs, axis=0)  # [WP*N, C]

    y = (
        jnp.dot(o.astype(x_ref.dtype), proj_w_ref[...],
                preferred_element_type=jnp.float32)
        + proj_b_ref[...]
    )
    out_ref[...] = y.astype(out_ref.dtype).reshape(wp, n, c)


@functools.lru_cache(maxsize=64)
def _shift_mask_np(window: Tuple[int, int, int], grid: Tuple[int, int, int],
                   shift: Tuple[int, int, int]) -> np.ndarray:
    """[nW, 1, N, N] additive shift-mask component (zeros when unshifted)."""
    mask = shifted_window_mask(grid, window, shift)
    n = window[0] * window[1] * window[2]
    nw = (grid[0] // window[0]) * (grid[1] // window[1]) * (grid[2] // window[2])
    if mask is None:
        return np.zeros((nw, 1, n, n), np.float32)
    return mask[:, None, :, :].astype(np.float32)


def _pallas_window_attention_fwd(
    x: jnp.ndarray,  # [B, G, G, G, C], already cyclically shifted
    qkv_kernel: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: jnp.ndarray,
    bias_table: jnp.ndarray,  # [(2w-1)^3, heads]
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
    num_heads: int,
) -> jnp.ndarray:
    b = x.shape[0]
    c = x.shape[-1]
    n = window[0] * window[1] * window[2]

    xw, counts = window_partition_3d(x, window)  # [B, nW, N, C]
    n_windows = xw.shape[1]
    xw = xw.reshape(b * n_windows, n, c)

    rel_idx = jnp.asarray(relative_position_index_3d(tuple(window)))
    rel_bias = bias_table[rel_idx].transpose(2, 0, 1).astype(jnp.float32)
    shift_m = jnp.asarray(
        _shift_mask_np(tuple(window), x.shape[1:4], tuple(shift))
    )
    bias = rel_bias[None] + shift_m  # [nW, h, N, N]

    wp = _pick_group(n_windows, num_heads)
    grid = (b * n_windows // wp,)

    kernel = functools.partial(_fused_window_attn_kernel, num_heads=num_heads)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (wp, num_heads, n, n),
                lambda i, _nw=n_windows // wp: (i % _nw, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xw.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(
        xw,
        qkv_kernel.astype(x.dtype),
        qkv_bias.astype(jnp.float32).reshape(1, -1),
        proj_kernel.astype(x.dtype),
        proj_bias.astype(jnp.float32).reshape(1, -1),
        bias,
    )
    out = out.reshape(b, n_windows, n, c)
    return window_unpartition_3d(out, window, counts)


def pallas_supported(shape, window, shift) -> bool:
    """Fused path handles non-divisible grids by zero-padding (same
    semantics as the XLA path); it only needs the per-window token count on
    a sublane multiple and a sane channel count."""
    c = shape[-1]
    # blocks always span the full N and C dims, so the (8, 128) tiling rule
    # is satisfied whenever N is a sublane multiple. C is capped because the
    # double-buffered qkv/proj weights must fit scoped VMEM (C=1024 needs
    # ~17MB > the 16MB budget); the large-C stages have few tokens anyway.
    n = window[0] * window[1] * window[2]
    return n % 8 == 0 and c % 8 == 0 and c <= 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_window_attention(
    x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
    window, shift, num_heads,
):
    """Shifted-window MSA with fused Pallas forward and jnp-derived backward.
    Same contract as ops.window_attention_3d (minus the padding path)."""
    b, g0, g1, g2, c = x.shape
    # zero-pad to window multiples; padded tokens attend like the XLA path
    # (reference pads with zeros too — swin_mae3d.py:61-65)
    pad = tuple((window[i] - (g0, g1, g2)[i] % window[i]) % window[i]
                for i in range(3))
    h = x
    if any(pad):
        h = jnp.pad(h, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)))
    ph = (g0 + pad[0], g1 + pad[1], g2 + pad[2])
    shift = tuple(0 if window[i] >= ph[i] else shift[i] for i in range(3))
    if sum(shift) > 0:
        h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    h = _pallas_window_attention_fwd(
        h, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
        tuple(window), shift, num_heads,
    )
    if sum(shift) > 0:
        h = jnp.roll(h, shift, axis=(1, 2, 3))
    if any(pad):
        h = h[:, :g0, :g1, :g2, :]
    return h


def _fwd(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
         window, shift, num_heads):
    out = fused_window_attention(
        x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
        window, shift, num_heads,
    )
    return out, (x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table)


def _bwd(window, shift, num_heads, residuals, g):
    x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table = residuals
    _, vjp = jax.vjp(
        lambda *args: window_attention_3d(
            *args, window=window, shift=shift, num_heads=num_heads
        ),
        x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
    )
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
