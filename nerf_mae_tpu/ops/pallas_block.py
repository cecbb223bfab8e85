"""Whole Swin block as one fused Pallas TPU kernel (fwd AND bwd).

One Swin block is LN -> shifted-window MSA -> droppath residual -> LN ->
MLP -> droppath residual (reference: nerf_mae/model/mae/swin_mae3d.py:310-369).
At the early stages the token tensors are large ([B, 40^3, C] at 160^3 input)
and every one of those sub-ops is an HBM round trip — the encoder measures
at 5-10% MXU utilization because it is bound by those passes, not FLOPs.
This kernel reads the residual stream once, keeps LN statistics, qkv,
attention, and both MLP matmuls in VMEM, and writes the residual stream
once: ~2 HBM passes per block instead of ~10.

The backward kernel recomputes the forward in VMEM and accumulates all
parameter gradients across the sequential TPU grid into constant-index
output blocks, exactly like ops/pallas_attention.py's backward. Because the
custom_vjp saves only (x, params) and recomputes in-kernel, the block is its
own rematerializer — SwinEncoder3D skips jax.checkpoint on fused stages
(wrapping one would pay an extra forward for zero memory gain).

The forward and backward kernels pick window-group sizes independently
(_pick_group_block). Two measured v5e laws (PERF.md): SMALL groups win —
per-program overhead is not the binder (the sequential grid is a hardware
loop) and small blocks pipeline better; and EVEN groups get window
packing (_pack_rel_bias): two 64-token windows share one block-diagonal
[128, 128] attention matmul whose cross-window quadrants sit at -1e9, so
the MXU runs full-width tiles while the math stays exactly two
independent windows. (fwd, bwd) = (4, 4) paired took stage0's block pair
from 76.0 to 47.5 ms.

Scope / fallbacks:
  * channel count C <= 512: the f32 weight-gradient accumulators for
    qkv/proj/fc1/fc2 must stay resident in VMEM (~12.6 MB at C=512, ~50 MB
    at C=1024). The C=1024 stage uses the attention-only fused kernel.
  * non-divisible grids are zero-padded to window multiples (10^3 -> 12^3
    at stage 2). The XLA path applies LN *before* zero-padding, so padded
    tokens enter attention as exact zeros (keys/values = qkv_bias); to
    reproduce that with LN fused inside, the kernel multiplies the post-LN
    rows by a per-window validity mask (pad_mask), which zeroes the
    LN(0)=bias rows — bitwise the same attention inputs as the XLA path.
    The backward applies the identical mask to dh1, which is exactly the
    vjp of the zero-pad (crop).

Droppath (stochastic depth) enters as two per-sample keep factors
(already scaled by 1/(1-rate)) broadcast per window and read from SMEM.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_mae_tpu.ops.pallas_attention import (
    _pack_factor,
    _pack_rel_bias,
    _pack_shift_mask,
    _plan_groups,
    _rel_bias_and_shift_mask,
)
from nerf_mae_tpu.ops.window_attention import (
    relative_position_index_3d,
    window_partition_3d,
    window_unpartition_3d,
)

_SQRT_2_OVER_PI = np.float32(np.sqrt(2.0 / np.pi))
_GELU_C = np.float32(0.044715)


def _gelu_tanh(x):
    """tanh-approximated gelu, matching jax.nn.gelu(approximate=True)."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(x):
    """d/dx of _gelu_tanh at f32 precision."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _ln_fwd(xf, scale, bias, eps):
    """f32 LayerNorm matching flax (fast variance). Returns (y, xhat, inv)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd_input(dy, xhat, inv, scale):
    """Input grad of LayerNorm given upstream dy (all f32)."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2)


def _bwd_vmem_estimate(wp: int, n: int, c: int, hidden: int,
                       num_heads: int) -> int:
    """Rough scoped-VMEM bytes for the backward kernel at group size wp:
    double-buffered bf16 weights + resident f32 grad accumulators +
    per-program f32 intermediates (qkv/dqkv [WP*N, 3C], ~4 [WP*N, F]
    buffers) + triple x/dy/dx blocks. Calibrated on v5e: wp=5 @ C=256
    (~16.5 MB) fails, wp=8 @ C=128 (~10 MB) and wp=1 @ C=256 (~8 MB) pass."""
    weights = 2 * 2 * (4 * c * c + 2 * c * hidden)  # bf16, double-buffered
    accums = 4 * (4 * c * c + 2 * c * hidden) + 4 * num_heads * n * n
    inter = wp * n * (4 * hidden * 4 + 2 * 3 * c * 4)
    blocks = 3 * 2 * wp * n * c * 2
    return weights + accums + inter + blocks


def _fwd_vmem_estimate(wp: int, n: int, c: int, hidden: int,
                       num_heads: int) -> int:
    """Scoped-VMEM bytes for the forward kernel: no grad accumulators, so a
    much larger window group amortizes per-program overhead (the early
    stages are overhead-bound: ~1000 programs of ~0.4 GFLOP each)."""
    weights = 2 * 2 * (4 * c * c + 2 * c * hidden)  # bf16, double-buffered
    inter = wp * n * (3 * c + c + 2 * hidden) * 4  # qkv/o/f1/g f32
    blocks = 2 * 2 * wp * n * c * 2  # x/out bf16, double-buffered
    return weights + inter + blocks + num_heads * n * n * 4


def _pick_group_block(n_windows: int, num_heads: int, n: int, c: int,
                      hidden: int, mode: str = "bwd") -> int:
    """Windows per program: big-enough MXU matmuls, bounded VMEM. The
    backward kernel's resident grad accumulators bind it to small groups;
    the forward kernel has no accumulators and runs much larger ones
    (the early stages are overhead-bound: ~1000 programs of ~0.4 GFLOP at
    wp=8). wp must divide the per-sample window count so the shift-mask
    block stays contiguous; wp*heads is capped to bound kernel unrolling."""
    override = int(os.environ.get(f"NERF_MAE_FUSED_WP_{mode.upper()}", "0"))
    if override and n_windows % override == 0:  # perf-sweep escape hatch
        return override
    estimate = _bwd_vmem_estimate if mode == "bwd" else _fwd_vmem_estimate
    # Even groups get window pairing (see _pair_rel_bias) and small groups
    # pipeline better than large ones — per-program overhead is NOT the
    # binder. v5e stage0 [8,40^3,128] pair fwd+bwd sweep: (fwd,bwd)=(4,4)
    # 47.5ms vs the old (25,10) 76.0ms; wp=5 fwd (1600 programs) also beat
    # wp=25 (320). Prefer 4, then other evens, then odds.
    if mode == "bwd":
        candidates = (4, 8, 2, 10, 5, 9, 3)
    else:
        candidates = (4, 8, 2, 10, 16, 20, 25, 5, 9, 3)
    cap = 64 if mode == "bwd" else 128
    # the 14 MB scoped-VMEM budget is v5e-calibrated at C<=256 (admits
    # bwd wp=4 at C=256, 13.0 MB estimated — measured 12.54 vs 12.89 ms
    # stage1 pair fwd+bwd vs wp=2, and compiles/runs on v5e under the
    # raised Mosaic limit below); the C=512 stage carries ~13 MB of
    # resident accumulators alone and still fits comfortably in the
    # 128 MB VMEM at small wp. A same-process v5e sweep of the other
    # stages' (fwd, bwd) picks confirmed the heuristic's choices:
    # stage0 (4,4) 43.25 ms beats (8,4) 43.97; stage2 (4,4) 7.59 beats
    # (2,4) 7.72; stage3 (1,1) 5.34 beats (2,2) 5.48 (PERF.md r5).
    budget = (14 << 20) if c <= 256 else (40 << 20)
    for wp in candidates:
        if (n_windows % wp == 0 and wp * num_heads <= cap
                and estimate(wp, n, c, hidden, num_heads) <= budget):
            return wp
    return 1


# Routes C in (256, 512] and padded (non-divisible) grids through the
# fused block kernel. Numerics are pinned vs XLA in tests; flipped on once
# Mosaic-validated on real TPU (kernel code is shape-generic, but large-C
# VMEM budgets are empirical — see _pick_group_block).
LARGE_C_ENABLED = os.environ.get("NERF_MAE_FUSED_BLOCK_LARGE_C", "1") == "1"

# Mosaic's default scoped-VMEM limit is 16 MB — the C=512 backward kernel
# needs ~31 MB of stack (measured from the compile error this raises
# without it: "Scoped allocation with size 31.26M and limit 16.00M").
# v5e has 128 MB VMEM; 100 MB leaves headroom for double-buffered blocks.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def fused_block_supported(shape, window, num_heads, mlp_ratio) -> bool:
    """True when the full-block kernel handles this stage (see module doc).
    Non-divisible grids are padded (pad_mask); only C binds."""
    b, g0, g1, g2, c = shape
    n = window[0] * window[1] * window[2]
    if n % 8 != 0 or c % 8 != 0:
        return False
    if LARGE_C_ENABLED:
        return c <= 512
    divisible = all((g0, g1, g2)[i] % window[i] == 0 for i in range(3))
    return divisible and c <= 256


@functools.lru_cache(maxsize=64)
def _pad_row_mask(padded, orig, window, shift):
    """[nW, N] f32 validity mask of the padded+rolled grid: 1 for tokens
    inside the original extent, 0 for zero-pad rows. Static numpy."""
    v = np.zeros(padded, np.float32)
    v[: orig[0], : orig[1], : orig[2]] = 1.0
    if sum(shift) > 0:
        v = np.roll(v, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
    nh, nw, nd = (padded[i] // window[i] for i in range(3))
    v = v.reshape(nh, window[0], nw, window[1], nd, window[2])
    v = v.transpose(0, 2, 4, 1, 3, 5).reshape(nh * nw * nd, -1)
    # trailing singleton: Mosaic requires the last two block dims to divide
    # (8, 128) or equal the array dims; [nW, N, 1] blocks as (wp, N, 1)
    return v[..., None]


def _attn_rows(qkv, rel_bias_ref, shift_mask_ref, w, n, c, num_heads,
               has_shift, dot_dtype=jnp.float32):
    """Per-window(-pair) attention over rows [w*n, (w+1)*n): returns
    (o [N, C] f32, list of per-head (p, q, k, v) residuals for the
    backward). With window pairing n is 2x the token count and the bias
    carries the block-diagonal mask.

    dot_dtype: input dtype of the q@k / p@v MXU matmuls (f32 accumulate
    always). The XLA reference path runs them in the compute dtype
    (window_attention.py:150-173: qkv cast to x.dtype before the einsums,
    softmax in f32) — passing bfloat16 here matches those semantics AND the
    v5e fast path: f32 MXU inputs decompose into multiple passes (see the
    measured train-step A/B in PERF.md r5)."""
    hd = c // num_heads
    scale = hd ** -0.5
    rows = slice(w * n, (w + 1) * n)
    head_outs = []
    saved = []
    for h in range(num_heads):
        q = (qkv[rows, h * hd:(h + 1) * hd] * scale).astype(dot_dtype)
        k = qkv[rows, c + h * hd: c + (h + 1) * hd].astype(dot_dtype)
        v = qkv[rows, 2 * c + h * hd: 2 * c + (h + 1) * hd].astype(dot_dtype)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + rel_bias_ref[h]
        if has_shift:
            logits = logits + shift_mask_ref[w]
        p = jax.nn.softmax(logits, axis=-1)
        head_outs.append(jnp.dot(p.astype(dot_dtype), v,
                                 preferred_element_type=jnp.float32))
        saved.append((p, q, k, v))
    return jnp.concatenate(head_outs, axis=-1), saved


def _fused_block_kernel(
    keep_sref,  # [B, 2] f32 scalar-prefetch (SMEM): per-sample droppath
    x_ref,  # [WP, N, C] residual-stream tokens (compute dtype)
    ln1_s_ref, ln1_b_ref,  # [1, C] f32
    qkv_w_ref,  # [C, 3C] compute dtype
    qkv_b_ref,  # [1, 3C] f32
    proj_w_ref,  # [C, C]
    proj_b_ref,  # [1, C] f32
    ln2_s_ref, ln2_b_ref,  # [1, C] f32
    fc1_w_ref,  # [C, F]
    fc1_b_ref,  # [1, F] f32
    fc2_w_ref,  # [F, C]
    fc2_b_ref,  # [1, C] f32
    rel_bias_ref,  # [heads, N, N] f32, constant-index (VMEM-resident)
    *rest,  # optional pad_mask_ref [WP, N]; optional shift_mask_ref
    # [WP, N, N]; then out_ref [WP, N, C]
    num_heads: int,
    has_shift: bool,
    has_pad: bool,
    pack: int,
    eps: float,
    n_windows: int,
):
    idx = 0
    pad_mask_ref = None
    if has_pad:
        pad_mask_ref = rest[idx]
        idx += 1
    shift_mask_ref = rest[idx] if has_shift else None
    out_ref = rest[-1]
    wp, n, c = x_ref.shape
    d = x_ref.dtype
    base = pl.program_id(0) * wp  # first window row of this program

    x = x_ref[...].reshape(wp * n, c)  # residual stream, dtype d
    xf = x.astype(jnp.float32)
    h1, _, _ = _ln_fwd(xf, ln1_s_ref[...], ln1_b_ref[...], eps)
    h1 = h1.astype(d)
    if has_pad:
        # zero the LN(0)=bias rows at padded sites so keys/values reduce
        # to qkv_bias exactly like the XLA LN-before-pad path
        h1 = h1 * pad_mask_ref[...].reshape(wp * n, 1).astype(d)

    qkv = (
        jnp.dot(h1, qkv_w_ref[...], preferred_element_type=jnp.float32)
        + qkv_b_ref[...]
    )  # [WP*N, 3C] f32

    m = pack * n  # tokens per attention matmul (see _pack_rel_bias)
    o_rows = []
    for w in range(wp * n // m):
        o, _ = _attn_rows(qkv, rel_bias_ref, shift_mask_ref, w, m, c,
                          num_heads, has_shift, dot_dtype=d)
        o_rows.append(o)
    o = jnp.concatenate(o_rows, axis=0)  # [WP*N, C] f32

    y = (
        jnp.dot(o.astype(d), proj_w_ref[...],
                preferred_element_type=jnp.float32)
        + proj_b_ref[...]
    ).astype(d)

    # droppath residual #1 (per-window scalar keep from SMEM)
    x1_rows = []
    for w in range(wp):
        rows = slice(w * n, (w + 1) * n)
        ka = keep_sref[(base + w) // n_windows, 0].astype(d)
        x1_rows.append(x[rows] + y[rows] * ka)
    x1 = jnp.concatenate(x1_rows, axis=0)  # dtype d

    x1f = x1.astype(jnp.float32)
    h2, _, _ = _ln_fwd(x1f, ln2_s_ref[...], ln2_b_ref[...], eps)
    h2 = h2.astype(d)

    f1 = (
        jnp.dot(h2, fc1_w_ref[...], preferred_element_type=jnp.float32)
    ).astype(d) + fc1_b_ref[...].astype(d)
    g = _gelu_tanh(f1.astype(jnp.float32)).astype(d)
    f2 = (
        jnp.dot(g, fc2_w_ref[...], preferred_element_type=jnp.float32)
    ).astype(d) + fc2_b_ref[...].astype(d)

    out_rows = []
    for w in range(wp):
        rows = slice(w * n, (w + 1) * n)
        km = keep_sref[(base + w) // n_windows, 1].astype(d)
        out_rows.append(x1[rows] + f2[rows] * km)
    out = jnp.concatenate(out_rows, axis=0)
    out_ref[...] = out.reshape(wp, n, c)


def _fused_block_bwd_kernel(
    keep_sref,  # [B, 2] f32 scalar-prefetch (SMEM): per-sample droppath
    x_ref,  # [WP, N, C]
    ln1_s_ref, ln1_b_ref,
    qkv_w_ref, qkv_b_ref,
    proj_w_ref, proj_b_ref,
    ln2_s_ref, ln2_b_ref,
    fc1_w_ref, fc1_b_ref,
    fc2_w_ref, fc2_b_ref,
    rel_bias_ref,
    *rest,
    # rest = optional pad_mask_ref [WP, N]; optional shift_mask_ref;
    # dy_ref [WP, N, C]; then out refs:
    # dx [WP,N,C]; accumulated dln1_s [1,C], dln1_b [1,C], dqkv_w [C,3C],
    # dqkv_b [1,3C], dproj_w [C,C], dproj_b [1,C], dln2_s, dln2_b,
    # dfc1_w [C,F], dfc1_b [1,F], dfc2_w [F,C], dfc2_b [1,C],
    # dlogit [heads,N,N]
    num_heads: int,
    has_shift: bool,
    has_pad: bool,
    pack: int,
    eps: float,
    n_windows: int,
):
    idx = 0
    pad_mask_ref = None
    if has_pad:
        pad_mask_ref = rest[idx]
        idx += 1
    shift_mask_ref = rest[idx] if has_shift else None
    dy_ref = rest[idx + 1] if has_shift else rest[idx]
    (dx_ref, dln1_s_ref, dln1_b_ref, dqkv_w_ref, dqkv_b_ref, dproj_w_ref,
     dproj_b_ref, dln2_s_ref, dln2_b_ref, dfc1_w_ref, dfc1_b_ref,
     dfc2_w_ref, dfc2_b_ref, dlogit_ref) = rest[-14:]

    wp, n, c = x_ref.shape
    d = x_ref.dtype
    base = pl.program_id(0) * wp

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dln1_s_ref, dln1_b_ref, dqkv_w_ref, dqkv_b_ref,
                    dproj_w_ref, dproj_b_ref, dln2_s_ref, dln2_b_ref,
                    dfc1_w_ref, dfc1_b_ref, dfc2_w_ref, dfc2_b_ref,
                    dlogit_ref):
            ref[...] = jnp.zeros_like(ref)

    # ---- recompute forward ----
    x = x_ref[...].reshape(wp * n, c)
    xf = x.astype(jnp.float32)
    h1f, xhat1, inv1 = _ln_fwd(xf, ln1_s_ref[...], ln1_b_ref[...], eps)
    h1 = h1f.astype(d)
    pm = None
    if has_pad:
        pm = pad_mask_ref[...].reshape(wp * n, 1)
        h1 = h1 * pm.astype(d)
    qkv = (
        jnp.dot(h1, qkv_w_ref[...], preferred_element_type=jnp.float32)
        + qkv_b_ref[...]
    )
    m = pack * n
    o_rows, attn_saved = [], []
    for w in range(wp * n // m):
        o, saved = _attn_rows(qkv, rel_bias_ref, shift_mask_ref, w, m, c,
                              num_heads, has_shift, dot_dtype=d)
        o_rows.append(o)
        attn_saved.append(saved)
    o = jnp.concatenate(o_rows, axis=0)
    y = (
        jnp.dot(o.astype(d), proj_w_ref[...],
                preferred_element_type=jnp.float32)
        + proj_b_ref[...]
    ).astype(d)
    x1_rows = []
    for w in range(wp):
        rows = slice(w * n, (w + 1) * n)
        x1_rows.append(x[rows] + y[rows] * keep_sref[(base + w) // n_windows, 0].astype(d))
    x1 = jnp.concatenate(x1_rows, axis=0)
    x1f = x1.astype(jnp.float32)
    h2f, xhat2, inv2 = _ln_fwd(x1f, ln2_s_ref[...], ln2_b_ref[...], eps)
    h2 = h2f.astype(d)
    f1 = (
        jnp.dot(h2, fc1_w_ref[...], preferred_element_type=jnp.float32)
    ).astype(d) + fc1_b_ref[...].astype(d)
    f1f = f1.astype(jnp.float32)
    g = _gelu_tanh(f1f).astype(d)

    # ---- backward ----
    dout = dy_ref[...].reshape(wp * n, c).astype(jnp.float32)

    # MLP branch: out = x1 + f2 * km
    df2_rows = []
    for w in range(wp):
        rows = slice(w * n, (w + 1) * n)
        df2_rows.append(dout[rows] * keep_sref[(base + w) // n_windows, 1])
    df2 = jnp.concatenate(df2_rows, axis=0)  # f32

    dfc2_b_ref[...] += jnp.sum(df2, axis=0, keepdims=True)
    dg = jax.lax.dot_general(
        df2.astype(d), fc2_w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [WP*N, F]
    dfc2_w_ref[...] += jax.lax.dot_general(
        g, df2.astype(d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    df1 = dg * _gelu_tanh_grad(f1f)
    dfc1_b_ref[...] += jnp.sum(df1, axis=0, keepdims=True)
    dh2 = jax.lax.dot_general(
        df1.astype(d), fc1_w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dfc1_w_ref[...] += jax.lax.dot_general(
        h2, df1.astype(d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dln2_s_ref[...] += jnp.sum(dh2 * xhat2, axis=0, keepdims=True)
    dln2_b_ref[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dx1 = dout + _ln_bwd_input(dh2, xhat2, inv2, ln2_s_ref[...])

    # attention branch: x1 = x + y * ka
    dy_attn_rows = []
    for w in range(wp):
        rows = slice(w * n, (w + 1) * n)
        dy_attn_rows.append(dx1[rows] * keep_sref[(base + w) // n_windows, 0])
    dy_attn = jnp.concatenate(dy_attn_rows, axis=0)  # f32, grad of y

    dproj_b_ref[...] += jnp.sum(dy_attn, axis=0, keepdims=True)
    do = jax.lax.dot_general(
        dy_attn.astype(d), proj_w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dproj_w_ref[...] += jax.lax.dot_general(
        o.astype(d), dy_attn.astype(d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    hd = c // num_heads
    scale = hd ** -0.5
    dqkv_rows = []
    for w in range(wp * n // m):
        rows = slice(w * m, (w + 1) * m)
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            # q/k/v were saved in the dot dtype (bf16 under the bf16 train
            # config — the XLA vjp contracts the same dtypes); cast the f32
            # cotangents to match so every grad matmul takes the fast MXU
            # path with f32 accumulation
            p, q, k, v = attn_saved[w][h]
            do_h = do[rows, h * hd:(h + 1) * hd].astype(d)
            dp = jax.lax.dot_general(
                do_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dvs.append(jax.lax.dot_general(
                p.astype(d), do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dlogit_ref[h] += dl
            dl_d = dl.astype(d)
            dqs.append(
                jnp.dot(dl_d, k, preferred_element_type=jnp.float32) * scale
            )
            # q already carries the fwd scale, so this is d(k) exactly
            dks.append(jax.lax.dot_general(
                dl_d, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dqkv_rows.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
    dqkv = jnp.concatenate(dqkv_rows, axis=0)  # [WP*N, 3C] f32

    dqkv_b_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dqkv_w_ref[...] += jax.lax.dot_general(
        h1, dqkv.astype(d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh1 = jax.lax.dot_general(
        dqkv.astype(d), qkv_w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_pad:
        # vjp of the h1 row-mask (== vjp of the XLA path's zero-pad crop)
        dh1 = dh1 * pm
    dln1_s_ref[...] += jnp.sum(dh1 * xhat1, axis=0, keepdims=True)
    dln1_b_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dx = dx1 + _ln_bwd_input(dh1, xhat1, inv1, ln1_s_ref[...])
    dx_ref[...] = dx.astype(d).reshape(wp, n, c)


def _prep(x, keep_attn, keep_mlp, bias_table, window, shift):
    """Shared fwd/bwd staging: pad, roll, partition, keep/bias/mask
    tensors. Pad-then-roll matches the XLA path's ordering
    (window_attention_3d)."""
    b, g0, g1, g2, c = x.shape
    pad = tuple((window[i] - (g0, g1, g2)[i] % window[i]) % window[i]
                for i in range(3))
    ph = (g0 + pad[0], g1 + pad[1], g2 + pad[2])
    shift = tuple(0 if window[i] >= ph[i] else shift[i] for i in range(3))
    h = x
    if any(pad):
        h = jnp.pad(h, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]),
                        (0, 0)))
    if sum(shift) > 0:
        h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
    xw, counts = window_partition_3d(h, window)  # [B, nW, N, C]
    n_windows = xw.shape[1]
    n = window[0] * window[1] * window[2]
    xw = xw.reshape(b * n_windows, n, c)
    # per-SAMPLE keep factors: [B, 2]. Kept sample-indexed (not
    # per-window) because the scalar-prefetch array lives in SMEM, which is
    # tiny — a per-window copy overflows it at 40^3 grids (1000 windows).
    keep2 = jnp.stack(
        [keep_attn.astype(jnp.float32), keep_mlp.astype(jnp.float32)],
        axis=-1,
    )
    rel_bias, shift_m = _rel_bias_and_shift_mask(
        bias_table, window, ph, shift
    )
    pad_m = (
        jnp.asarray(_pad_row_mask(ph, (g0, g1, g2), tuple(window), shift))
        if any(pad) else None
    )
    return xw, counts, n_windows, n, keep2, rel_bias, shift_m, pad_m, shift, pad


def _block_specs(wp, n, c, f, num_heads, n_windows, m=None):
    """The 14 input BlockSpecs shared (in order) by fwd and bwd. Index maps
    take *_ because scalar-prefetch grid specs pass the SMEM refs along.
    `m` is the attention tile edge (2n when window-paired)."""
    m = m or n
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return [
        pl.BlockSpec((wp, n, c), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),  # x
        const(1, c), const(1, c),  # ln1
        const(c, 3 * c), const(1, 3 * c),  # qkv
        const(c, c), const(1, c),  # proj
        const(1, c), const(1, c),  # ln2
        const(c, f), const(1, f),  # fc1
        const(f, c), const(1, c),  # fc2
        const(num_heads, m, m),  # rel_bias (paired: block-diag 2N tile)
    ]


def _operands(xw, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, ln2_s, ln2_b,
              fc1_w, fc1_b, fc2_w, fc2_b, rel_bias, d):
    f32 = jnp.float32
    row = lambda t: t.astype(f32).reshape(1, -1)
    return [
        xw,
        row(ln1_s), row(ln1_b),
        qkv_w.astype(d), row(qkv_b),
        proj_w.astype(d), row(proj_b),
        row(ln2_s), row(ln2_b),
        fc1_w.astype(d), row(fc1_b),
        fc2_w.astype(d), row(fc2_b),
        rel_bias,
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def fused_swin_block(
    x,  # [B, G0, G1, G2, C], grid divisible by window
    ln1_scale, ln1_bias,
    qkv_kernel, qkv_bias,
    proj_kernel, proj_bias,
    ln2_scale, ln2_bias,
    fc1_kernel, fc1_bias,
    fc2_kernel, fc2_bias,
    bias_table,
    keep_attn,  # [B] f32, droppath keep/(1-rate) for the attention branch
    keep_mlp,  # [B] f32, same for the MLP branch
    window: Tuple[int, int, int],
    shift: Tuple[int, int, int],
    num_heads: int,
    eps: float,
):
    """One whole Swin block, fused. Same math as the SwinBlock3D XLA
    composition (LN in f32, matmuls in x.dtype with f32 accumulation)."""
    b, g0, g1, g2, c = x.shape
    d = x.dtype
    f = fc1_kernel.shape[-1]
    (xw, counts, n_windows, n, keep2, rel_bias, shift_m, pad_m,
     eff_shift, pad) = _prep(x, keep_attn, keep_mlp, bias_table, window,
                             shift)
    has_shift = shift_m is not None
    has_pad = pad_m is not None

    # sample-aligned groups keep the shift/pad masks' periodic block
    # indexing; when that forbids packing (odd per-sample window counts:
    # 125 at stage1, 27 at padded stage2) the masks are tiled per batch
    # (flat_mask) so groups span the even flat batch*nW axis
    wp, flat_mask = _plan_groups(
        n_windows, b, has_shift or has_pad,
        lambda nv, _m="fwd": _pick_group_block(nv, num_heads, n, c, f,
                                               mode=_m), n)
    pack = _pack_factor(wp)
    m = pack * n
    if pack > 1:
        rel_bias = _pack_rel_bias(rel_bias, pack)
    if flat_mask:
        if has_pad:
            pad_m = jnp.tile(pad_m, (b, 1, 1))
        if has_shift:
            shift_m = jnp.tile(shift_m, (b, 1, 1))
    if pack > 1 and has_shift:
        shift_m = _pack_shift_mask(shift_m, pack)
    grid = (b * n_windows // wp,)
    kernel = functools.partial(
        _fused_block_kernel, num_heads=num_heads, has_shift=has_shift,
        has_pad=has_pad, pack=pack, eps=eps, n_windows=n_windows,
    )
    in_specs = _block_specs(wp, n, c, f, num_heads, n_windows, m=m)
    operands = _operands(xw, ln1_scale, ln1_bias, qkv_kernel, qkv_bias,
                         proj_kernel, proj_bias, ln2_scale, ln2_bias,
                         fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                         rel_bias, d)
    if has_pad:
        in_specs.append(pl.BlockSpec(
            (wp, n, 1),
            (lambda i, *_: (i, 0, 0)) if flat_mask else
            (lambda i, *_, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(pad_m)
    if has_shift:
        in_specs.append(pl.BlockSpec(
            (wp * n // m, m, m),
            (lambda i, *_: (i, 0, 0)) if flat_mask else
            (lambda i, *_, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(shift_m)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((wp, n, c), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(xw.shape, d),
        interpret=jax.default_backend() != "tpu",
        compiler_params=_VMEM_LIMIT,
    )(keep2, *operands)
    out = window_unpartition_3d(
        out.reshape(b, n_windows, n, c), window, counts
    )
    if sum(eff_shift) > 0:
        out = jnp.roll(out, eff_shift, axis=(1, 2, 3))
    if any(pad):
        out = out[:, :g0, :g1, :g2, :]
    return out


def _fwd(x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel,
         proj_bias, ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel,
         fc2_bias, bias_table, keep_attn, keep_mlp, window, shift,
         num_heads, eps):
    out = fused_swin_block(
        x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel,
        proj_bias, ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel,
        fc2_bias, bias_table, keep_attn, keep_mlp, window, shift,
        num_heads, eps,
    )
    return out, (x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel,
                 proj_bias, ln2_scale, ln2_bias, fc1_kernel, fc1_bias,
                 fc2_kernel, fc2_bias, bias_table, keep_attn, keep_mlp)


def _bwd(window, shift, num_heads, eps, residuals, g):
    (x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
     ln2_scale, ln2_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
     bias_table, keep_attn, keep_mlp) = residuals
    b, g0, g1, g2, c = x.shape
    d = x.dtype
    f = fc1_kernel.shape[-1]
    (xw, counts, n_windows, n, keep2, rel_bias, shift_m, pad_m,
     eff_shift, pad) = _prep(x, keep_attn, keep_mlp, bias_table, window,
                             shift)
    has_shift = shift_m is not None
    has_pad = pad_m is not None

    gy = g
    if any(pad):
        gy = jnp.pad(gy, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]),
                          (0, 0)))
    if sum(eff_shift) > 0:
        gy = jnp.roll(
            gy, (-eff_shift[0], -eff_shift[1], -eff_shift[2]), axis=(1, 2, 3)
        )
    dyw, _ = window_partition_3d(gy, window)
    dyw = dyw.reshape(b * n_windows, n, c)

    wp, flat_mask = _plan_groups(
        n_windows, b, has_shift or has_pad,
        lambda nv: _pick_group_block(nv, num_heads, n, c, f), n)
    pack = _pack_factor(wp)
    m = pack * n
    if pack > 1:
        rel_bias = _pack_rel_bias(rel_bias, pack)
    if flat_mask:
        if has_pad:
            pad_m = jnp.tile(pad_m, (b, 1, 1))
        if has_shift:
            shift_m = jnp.tile(shift_m, (b, 1, 1))
    if pack > 1 and has_shift:
        shift_m = _pack_shift_mask(shift_m, pack)
    grid = (b * n_windows // wp,)
    kernel = functools.partial(
        _fused_block_bwd_kernel, num_heads=num_heads, has_shift=has_shift,
        has_pad=has_pad, pack=pack, eps=eps, n_windows=n_windows,
    )
    in_specs = _block_specs(wp, n, c, f, num_heads, n_windows, m=m)
    operands = _operands(xw, ln1_scale, ln1_bias, qkv_kernel, qkv_bias,
                         proj_kernel, proj_bias, ln2_scale, ln2_bias,
                         fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                         rel_bias, d)
    if has_pad:
        in_specs.append(pl.BlockSpec(
            (wp, n, 1),
            (lambda i, *_: (i, 0, 0)) if flat_mask else
            (lambda i, *_, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(pad_m)
    if has_shift:
        in_specs.append(pl.BlockSpec(
            (wp * n // m, m, m),
            (lambda i, *_: (i, 0, 0)) if flat_mask else
            (lambda i, *_, _nw=n_windows // wp: (i % _nw, 0, 0)),
            memory_space=pltpu.VMEM,
        ))
        operands.append(shift_m)
    in_specs.append(pl.BlockSpec((wp, n, c), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(dyw)

    const = lambda *shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((wp, n, c), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const(1, c), const(1, c),
                const(c, 3 * c), const(1, 3 * c),
                const(c, c), const(1, c),
                const(1, c), const(1, c),
                const(c, f), const(1, f),
                const(f, c), const(1, c),
                const(num_heads, m, m),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xw.shape, d),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, f), f32),
            jax.ShapeDtypeStruct((1, f), f32),
            jax.ShapeDtypeStruct((f, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((num_heads, m, m), f32),
        ),
        interpret=jax.default_backend() != "tpu",
        compiler_params=_VMEM_LIMIT,
    )(keep2, *operands)
    (dxw, dln1_s, dln1_b, dqkv_w, dqkv_b, dproj_w, dproj_b, dln2_s, dln2_b,
     dfc1_w, dfc1_b, dfc2_w, dfc2_b, dlogit) = outs

    dx = window_unpartition_3d(
        dxw.reshape(b, n_windows, n, c), window, counts
    )
    if sum(eff_shift) > 0:
        dx = jnp.roll(dx, eff_shift, axis=(1, 2, 3))
    if any(pad):
        dx = dx[:, :g0, :g1, :g2, :]

    if pack > 1:
        # the diagonal blocks are the packed windows' logit grads; the
        # off-diagonals are exactly zero (softmax of -1e9)
        dlogit = sum(dlogit[:, i * n:(i + 1) * n, i * n:(i + 1) * n]
                     for i in range(pack))
    rel_idx = relative_position_index_3d(tuple(window))
    dtable = jnp.zeros_like(bias_table)
    dtable = dtable.at[rel_idx.reshape(-1)].add(
        dlogit.transpose(1, 2, 0).reshape(-1, num_heads)
    )
    vec = lambda t, ref: t.reshape(-1).astype(ref.dtype)
    return (
        dx.astype(x.dtype),
        vec(dln1_s, ln1_scale), vec(dln1_b, ln1_bias),
        dqkv_w.astype(qkv_kernel.dtype), vec(dqkv_b, qkv_bias),
        dproj_w.astype(proj_kernel.dtype), vec(dproj_b, proj_bias),
        vec(dln2_s, ln2_scale), vec(dln2_b, ln2_bias),
        dfc1_w.astype(fc1_kernel.dtype), vec(dfc1_b, fc1_bias),
        dfc2_w.astype(fc2_kernel.dtype), vec(dfc2_b, fc2_bias),
        dtable.astype(bias_table.dtype),
        jnp.zeros_like(keep_attn),
        jnp.zeros_like(keep_mlp),
    )


fused_swin_block.defvjp(_fwd, _bwd)
