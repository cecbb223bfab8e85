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

Bias layout: the relative-position bias enters as one constant-index
[heads, N, N] block (resident in VMEM across the whole grid) and the
shift mask — when the block is shifted at all — as a per-group [WP, N, N]
block broadcast over heads. Pre-adding them into a [nW, heads, N, N]
tensor (as the XLA path conceptually does) would re-DMA heads*WP times
more bias bytes per program than tokens.

Scope: fused forward AND backward kernels. The backward
(_fused_window_attn_bwd_kernel) recomputes the forward in VMEM and
accumulates weight/bias/logit grads across the sequential TPU grid;
fused_window_attention wires both up via jax.custom_vjp.
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
    the unrolled per-head attention loop (compile time / code size).
    Shifted blocks pass the per-sample window count (the mask block index
    must stay sample-aligned); unshifted blocks pass the flat batch*nW
    count, which is even and unlocks packing (e.g. 27 windows/sample ->
    216 flat)."""
    for wp in (4, 8, 2, 5, 3):
        if n_windows % wp == 0 and wp * num_heads <= 64:
            return wp
    return 1


def _pack_factor(wp: int) -> int:
    """Windows packed per attention tile (2 when the group is even).
    Measured on v5e: [128, hd] block-diagonal tiles beat half-empty
    [64, hd] ones; beyond 2 the k^2 masked-logit FLOPs outgrow the
    occupancy gain (PERF.md)."""
    return 2 if wp % 2 == 0 else 1


def _plan_groups(n_windows: int, b: int, has_mask: bool, pick, n: int):
    """Choose (wp, flat_mask). Sample-aligned groups keep the per-window
    masks' periodic block indexing; when that alignment forbids packing
    (odd per-sample window count) but the flat batch*nW axis allows it,
    the masks are instead tiled per batch (flat_mask=True, plain block
    index) — a small constant (e.g. 7 MB at stage2) for full-width tiles."""
    if not has_mask:
        return pick(b * n_windows), False
    wp = pick(n_windows)
    if _pack_factor(wp) > 1:
        return wp, False
    wp_flat = pick(b * n_windows)
    tiled_bytes = b * n_windows * 2 * (2 * n) * (2 * n)  # f32, packed tiles
    if _pack_factor(wp_flat) > 1 and tiled_bytes <= (64 << 20):
        return wp_flat, True
    return wp, False


def _pack_rel_bias(rb: jnp.ndarray, k: int) -> jnp.ndarray:
    """[H, N, N] -> [H, kN, kN] block-diagonal with -1e9 off-diagonal:
    k windows attend inside one [kN, kN] logits matmul whose cross-window
    blocks softmax to 0 — exactly k independent windows on full MXU tiles."""
    h, n, _ = rb.shape
    eye = jnp.asarray(np.eye(k, dtype=np.float32))
    off = jnp.asarray((1.0 - np.eye(k)).astype(np.float32)) * jnp.float32(-1e9)
    out = (eye[None, :, None, :, None] * rb[:, None, :, None, :]
           + off[None, :, None, :, None])
    return out.reshape(h, k * n, k * n)


def _pack_shift_mask(sm: jnp.ndarray, k: int) -> jnp.ndarray:
    """[nW, N, N] -> [nW//k, kN, kN]: consecutive windows' shift masks on
    the diagonal blocks (off-diagonals already dead via _pack_rel_bias)."""
    nw, n, _ = sm.shape
    sm = sm.reshape(nw // k, k, n, n)
    eye = jnp.asarray(np.eye(k, dtype=np.float32))
    out = eye[None, :, None, :, None] * sm[:, :, :, None, :]
    return out.reshape(nw // k, k * n, k * n)


def _fused_window_attn_kernel(
    x_ref,  # [WP, N, C] tokens of WP windows
    qkv_w_ref,  # [C, 3C]
    qkv_b_ref,  # [1, 3C]
    proj_w_ref,  # [C, C]
    proj_b_ref,  # [1, C]
    rel_bias_ref,  # [heads, N, N] constant-index (VMEM-resident)
    *rest,  # optional shift_mask_ref [WP/pack, M, M], then out_ref [WP, N, C]
    num_heads: int,
    has_shift: bool,
    pack: int,
):
    """Mosaic-friendly structure: the only reshape merges leading dims; the
    per-head/per-window attention uses static lane slices + 2D matmuls
    (Mosaic rejects reshapes that split the minor dim and >1 matmul batch
    dim)."""
    shift_mask_ref = rest[0] if has_shift else None
    out_ref = rest[-1]
    wp, n, c = x_ref.shape
    m = pack * n  # tokens per attention tile (see _pack_rel_bias)
    hd = c // num_heads
    scale = hd ** -0.5
    x = x_ref[...].reshape(wp * n, c)  # leading-dim merge: supported

    qkv = (
        jnp.dot(x, qkv_w_ref[...], preferred_element_type=jnp.float32)
        + qkv_b_ref[...]
    )  # [WP*N, 3C] fp32, VMEM-resident

    outs = []
    for w in range(wp * n // m):  # static unroll over window packs
        rows = slice(w * m, (w + 1) * m)
        head_outs = []
        for h in range(num_heads):  # static unroll
            # q@k / p@v run in the compute dtype (f32 accumulate), matching
            # the XLA path (window_attention.py:150-173) and the v5e fast
            # MXU path — f32-input dots decompose into multiple passes
            q = (qkv[rows, h * hd:(h + 1) * hd] * scale).astype(x_ref.dtype)
            k = qkv[rows, c + h * hd: c + (h + 1) * hd].astype(x_ref.dtype)
            v = qkv[rows, 2 * c + h * hd: 2 * c + (h + 1) * hd].astype(
                x_ref.dtype)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N]
            logits = logits + rel_bias_ref[h]
            if has_shift:
                logits = logits + shift_mask_ref[w]
            p = jax.nn.softmax(logits, axis=-1)
            head_outs.append(
                jnp.dot(p.astype(x_ref.dtype), v,
                        preferred_element_type=jnp.float32)
            )  # [N, hd]
        outs.append(jnp.concatenate(head_outs, axis=-1))  # [N, C]
    o = jnp.concatenate(outs, axis=0)  # [WP*N, C]

    y = (
        jnp.dot(o.astype(x_ref.dtype), proj_w_ref[...],
                preferred_element_type=jnp.float32)
        + proj_b_ref[...]
    )
    out_ref[...] = y.astype(out_ref.dtype).reshape(wp, n, c)


def _rel_bias_and_shift_mask(bias_table, window, grid_shape, shift):
    """Returns (rel_bias [heads, N, N] f32, shift_mask [nW, N, N] f32 or
    None). Kept separate so the kernel can hold the rel-bias resident and
    DMA only the small per-window mask (nothing materializes the
    [nW, heads, N, N] sum)."""
    rel_idx = jnp.asarray(relative_position_index_3d(tuple(window)))
    rel_bias = bias_table[rel_idx].transpose(2, 0, 1).astype(jnp.float32)
    mask = shifted_window_mask(tuple(grid_shape), tuple(window), tuple(shift))
    shift_m = None if mask is None else jnp.asarray(mask.astype(np.float32))
    return rel_bias, shift_m


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

    rel_bias, shift_m = _rel_bias_and_shift_mask(
        bias_table, window, x.shape[1:4], shift
    )
    has_shift = shift_m is not None

    wp, flat_mask = _plan_groups(
        n_windows, b, has_shift, lambda nv: _pick_group(nv, num_heads), n)
    pack = _pack_factor(wp)
    m = pack * n
    if pack > 1:
        rel_bias = _pack_rel_bias(rel_bias, pack)
    if has_shift:
        if flat_mask:
            shift_m = jnp.tile(shift_m, (b, 1, 1))
        if pack > 1:
            shift_m = _pack_shift_mask(shift_m, pack)
    grid = (b * n_windows // wp,)

    kernel = functools.partial(
        _fused_window_attn_kernel, num_heads=num_heads, has_shift=has_shift,
        pack=pack,
    )
    in_specs = [
        pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, m, m), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        xw,
        qkv_kernel.astype(x.dtype),
        qkv_bias.astype(jnp.float32).reshape(1, -1),
        proj_kernel.astype(x.dtype),
        proj_bias.astype(jnp.float32).reshape(1, -1),
        rel_bias,
    ]
    if has_shift:
        in_specs.append(pl.BlockSpec(
            (wp * n // m, m, m),
            (lambda i: (i, 0, 0)) if flat_mask else
            (lambda i, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(shift_m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xw.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(*operands)
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


def _fused_window_attn_bwd_kernel(
    x_ref,  # [WP, N, C]
    qkv_w_ref,  # [C, 3C]
    qkv_b_ref,  # [1, 3C]
    proj_w_ref,  # [C, C]
    rel_bias_ref,  # [heads, N, N] constant-index (VMEM-resident)
    *rest,  # optional shift_mask_ref [WP, N, N]; dy_ref; then the out refs:
    # dx [WP, N, C]; accumulated dqkv_w [C, 3C], dqkv_b [1, 3C],
    # dproj_w [C, C], dproj_b [1, C], dlogit [heads, N, N]
    num_heads: int,
    has_shift: bool,
    pack: int,
):
    """Backward of the fused window MSA: recomputes the forward in VMEM,
    then chains the VJP by hand. Weight/bias/logit grads accumulate across
    the (sequential) TPU grid into constant-index output blocks."""
    shift_mask_ref = rest[0] if has_shift else None
    dy_ref = rest[1] if has_shift else rest[0]
    (dx_ref, dqkv_w_ref, dqkv_b_ref, dproj_w_ref, dproj_b_ref,
     dlogit_ref) = rest[-6:]
    wp, n, c = x_ref.shape
    m = pack * n
    hd = c // num_heads
    scale = hd ** -0.5
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dqkv_w_ref[...] = jnp.zeros_like(dqkv_w_ref)
        dqkv_b_ref[...] = jnp.zeros_like(dqkv_b_ref)
        dproj_w_ref[...] = jnp.zeros_like(dproj_w_ref)
        dproj_b_ref[...] = jnp.zeros_like(dproj_b_ref)
        dlogit_ref[...] = jnp.zeros_like(dlogit_ref)

    x = x_ref[...].reshape(wp * n, c)
    dy = dy_ref[...].reshape(wp * n, c).astype(jnp.float32)

    # ---- recompute forward ----
    qkv = (
        jnp.dot(x, qkv_w_ref[...], preferred_element_type=jnp.float32)
        + qkv_b_ref[...]
    )  # [WP*N, 3C]

    # dO = dY @ Wp^T ; proj grads need o (rebuilt below per head)
    do = jax.lax.dot_general(
        dy.astype(x_ref.dtype), proj_w_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [WP*N, C]
    dproj_b_ref[...] += jnp.sum(dy, axis=0, keepdims=True)

    o_rows, dqkv_rows = [], []
    for w in range(wp * n // m):
        rows = slice(w * m, (w + 1) * m)
        head_o, dqs, dks, dvs = [], [], [], []
        for h in range(num_heads):
            # attention dots in the compute dtype (f32 accumulate) — same
            # rationale as the forward kernel; softmax/dl stay f32
            q = (qkv[rows, h * hd:(h + 1) * hd] * scale).astype(x_ref.dtype)
            k = qkv[rows, c + h * hd: c + (h + 1) * hd].astype(x_ref.dtype)
            v = qkv[rows, 2 * c + h * hd: 2 * c + (h + 1) * hd].astype(
                x_ref.dtype)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + rel_bias_ref[h]
            if has_shift:
                logits = logits + shift_mask_ref[w]
            p = jax.nn.softmax(logits, axis=-1)  # [N, N] f32
            p_d = p.astype(x_ref.dtype)
            head_o.append(jnp.dot(p_d, v,
                                  preferred_element_type=jnp.float32))

            do_h = do[rows, h * hd:(h + 1) * hd].astype(x_ref.dtype)
            dp = jax.lax.dot_general(
                do_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, N]
            dvs.append(jax.lax.dot_general(
                p_d, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # [N, hd]
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dlogit_ref[h] += dl
            dl_d = dl.astype(x_ref.dtype)
            dqs.append(
                jnp.dot(dl_d, k, preferred_element_type=jnp.float32) * scale
            )
            dks.append(jax.lax.dot_general(
                dl_d, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # [N, hd]  (note: q here carries the fwd scale; see below)
        o_rows.append(jnp.concatenate(head_o, axis=-1))
        dqkv_rows.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
    o = jnp.concatenate(o_rows, axis=0)  # [WP*N, C]
    dqkv = jnp.concatenate(dqkv_rows, axis=0)  # [WP*N, 3C]

    dproj_w_ref[...] += jax.lax.dot_general(
        o.astype(x_ref.dtype), dy.astype(x_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dproj_w_ref.dtype)

    dqkv_b_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dqkv_w_ref[...] += jax.lax.dot_general(
        x, dqkv.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dqkv_w_ref.dtype)

    dx = jax.lax.dot_general(
        dqkv.astype(x_ref.dtype), qkv_w_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(wp, n, c)


def _pallas_window_attention_bwd(
    x, qkv_kernel, qkv_bias, proj_kernel, bias_table, dy,
    window, shift, num_heads,
):
    """Runs the backward kernel on pre-shifted/padded tensors.
    Returns (dx, dWqkv, dbqkv, dWp, dbp, dtable)."""
    b = x.shape[0]
    c = x.shape[-1]
    n = window[0] * window[1] * window[2]
    xw, counts = window_partition_3d(x, window)
    n_windows = xw.shape[1]
    xw = xw.reshape(b * n_windows, n, c)
    dyw, _ = window_partition_3d(dy, window)
    dyw = dyw.reshape(b * n_windows, n, c)

    rel_bias, shift_m = _rel_bias_and_shift_mask(
        bias_table, window, x.shape[1:4], shift
    )
    has_shift = shift_m is not None

    wp, flat_mask = _plan_groups(
        n_windows, b, has_shift, lambda nv: _pick_group(nv, num_heads), n)
    pack = _pack_factor(wp)
    m = pack * n
    if pack > 1:
        rel_bias = _pack_rel_bias(rel_bias, pack)
    if has_shift:
        if flat_mask:
            shift_m = jnp.tile(shift_m, (b, 1, 1))
        if pack > 1:
            shift_m = _pack_shift_mask(shift_m, pack)
    grid = (b * n_windows // wp,)
    kernel = functools.partial(_fused_window_attn_bwd_kernel,
                               num_heads=num_heads, has_shift=has_shift,
                               pack=pack)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const(c, 3 * c),
        const(1, 3 * c),
        const(c, c),
        const(num_heads, m, m),
    ]
    operands = [
        xw,
        qkv_kernel.astype(x.dtype),
        qkv_bias.astype(jnp.float32).reshape(1, -1),
        proj_kernel.astype(x.dtype),
        rel_bias,
    ]
    if has_shift:
        in_specs.append(pl.BlockSpec(
            (wp * n // m, m, m),
            (lambda i: (i, 0, 0)) if flat_mask else
            (lambda i, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(shift_m)
    in_specs.append(pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(dyw)
    dx, dw_qkv, db_qkv, dw_p, db_p, dlogit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((wp, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(c, 3 * c),
            const(1, 3 * c),
            const(c, c),
            const(1, c),
            const(num_heads, m, m),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xw.shape, x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((num_heads, m, m), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    dx = window_unpartition_3d(dx.reshape(b, n_windows, n, c), window, counts)
    if pack > 1:
        # diagonal blocks are the packed windows' logit grads; off-diag = 0
        dlogit = sum(dlogit[:, i * n:(i + 1) * n, i * n:(i + 1) * n]
                     for i in range(pack))
    # bias-table grad: scatter the accumulated per-position logit grads
    rel_idx = relative_position_index_3d(tuple(window))
    dtable = jnp.zeros_like(bias_table)
    dtable = dtable.at[rel_idx.reshape(-1)].add(
        dlogit.transpose(1, 2, 0).reshape(-1, num_heads)
    )
    return dx, dw_qkv, db_qkv.reshape(-1), dw_p, db_p.reshape(-1), dtable


def _fwd(x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
         window, shift, num_heads):
    out = fused_window_attention(
        x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table,
        window, shift, num_heads,
    )
    return out, (x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table)


def _bwd(window, shift, num_heads, residuals, g):
    x, qkv_kernel, qkv_bias, proj_kernel, proj_bias, bias_table = residuals
    b, g0, g1, g2, c = x.shape
    pad = tuple((window[i] - (g0, g1, g2)[i] % window[i]) % window[i]
                for i in range(3))
    ph = (g0 + pad[0], g1 + pad[1], g2 + pad[2])
    eff_shift = tuple(0 if window[i] >= ph[i] else shift[i] for i in range(3))

    h = x
    gy = g
    if any(pad):
        widths = ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0))
        h = jnp.pad(h, widths)
        gy = jnp.pad(gy, widths)
    if sum(eff_shift) > 0:
        roll = (-eff_shift[0], -eff_shift[1], -eff_shift[2])
        h = jnp.roll(h, roll, axis=(1, 2, 3))
        gy = jnp.roll(gy, roll, axis=(1, 2, 3))

    dx, dw_qkv, db_qkv, dw_p, db_p, dtable = _pallas_window_attention_bwd(
        h, qkv_kernel, qkv_bias, proj_kernel, bias_table, gy,
        tuple(window), eff_shift, num_heads,
    )
    # dproj_bias: independent of windowing — sum of incoming grads
    db_p = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3))

    if sum(eff_shift) > 0:
        dx = jnp.roll(dx, eff_shift, axis=(1, 2, 3))
    if any(pad):
        dx = dx[:, :g0, :g1, :g2, :]
    return (
        dx.astype(x.dtype),
        dw_qkv.astype(qkv_kernel.dtype),
        db_qkv.astype(qkv_bias.dtype),
        dw_p.astype(proj_kernel.dtype),
        db_p.astype(proj_bias.dtype),
        dtable.astype(bias_table.dtype),
    )


fused_window_attention.defvjp(_fwd, _bwd)
