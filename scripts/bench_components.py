#!/usr/bin/env python
"""Isolated-component timings of the headline MAE train step.

Re-creates PERF.md's "component breakdown" table at the current operating
point (default: swin_b @160^3, batch 8, bf16, fused kernels on TPU): each
piece is instantiated standalone at its in-context shape with fresh params
and timed under its own jit, fwd and fwd+bwd (grad wrt params AND input,
loss = sum(out^2), mirroring how the piece sits inside the real backward).

Isolated numbers exclude cross-piece XLA fusion, so they upper-bound the
in-context cost — use them to rank targets, not to sum to the step time
(the optimizer and in-context loss are excluded for the same reason; the
full train step is bench.py's job).

Timing forces a host transfer per measured batch of reps: through the axon
tunnel block_until_ready can ack at dispatch (see bench.py:118-120).

Usage: python scripts/bench_components.py [--reps 20] [--out FILE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, reps):
    out = fn(*args)
    _force(out)  # compile + warm
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def _grad_fn(apply):
    def loss(params, *xs):
        out = apply(params, *xs)
        return (out.astype(jnp.float32) ** 2).sum()

    return jax.jit(jax.grad(loss, argnums=(0, 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="swin_b")
    ap.add_argument("--resolution", type=int, default=160)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", default="", help="substring filter on rows")
    ap.add_argument("--out", default="runs/component_breakdown.json")
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"])
    args = ap.parse_args()
    if args.platform:  # see scripts/common.py: sitecustomize caches axon
        os.environ["JAX_PLATFORMS"] = args.platform
        jax.config.update("jax_platforms", args.platform)

    from nerf_mae_tpu.config import SWIN_PRESETS, MAEConfig
    from nerf_mae_tpu.models.swin import SwinBlock3D, PatchMerging3D
    from nerf_mae_tpu.models.mae import _PatchEmbed
    from nerf_mae_tpu.models.unetr import SubpixelHead3D, UnetrUpBlock3D

    swin = SWIN_PRESETS[args.preset]
    cfg = MAEConfig(swin=swin, resolution=args.resolution)
    b, r = args.batch, args.resolution
    p = swin.patch_size[0]
    t = r // p
    e = swin.embed_dim
    dt = cfg.dtype
    key = jax.random.PRNGKey(0)
    rows = {}
    meta = {"preset": args.preset, "resolution": r, "batch": b,
            "reps": args.reps, "backend": jax.default_backend(),
            "unit": "ms"}

    def record(name, fwd_ms, bwd_ms=None):
        rows[name] = {"fwd": round(fwd_ms, 2)}
        if bwd_ms is not None:
            rows[name]["fwd_bwd"] = round(bwd_ms, 2)
        print(f"# {name:<42} fwd {fwd_ms:7.2f} ms"
              + (f"   fwd+bwd {bwd_ms:7.2f} ms" if bwd_ms is not None else ""),
              file=sys.stderr)

    def want(name):
        return args.only in name

    # --- patch embed (patched fast path; LN omitted: LN is ~free) -------
    # Embed rows take grad wrt params ONLY (the grids are data — the real
    # step never computes dx for the first layer) and feed the batch in
    # the train transfer dtype.
    def _embed_rows(xarg, label, apply):
        params = mod.init(key, x6)
        fwd = timeit(jax.jit(apply), params, xarg, reps=args.reps)
        g = jax.jit(jax.grad(
            lambda pr, xx: (apply(pr, xx).astype(jnp.float32) ** 2).sum()))
        bwd = timeit(g, params, xarg, reps=args.reps)
        record(label, fwd, bwd)

    if want("patch_embed"):
        mod = _PatchEmbed(e, p, dtype=dt)
        x6 = jax.random.normal(key, (b, t, t, t, p**3, 4), dt)
        _embed_rows(x6, "patch_embed_patched_k256", mod.apply)
    if want("patch_embed_flat"):
        # same matmul fed a channel-flat [B,T,T,T,p^3*Cin] operand: isolates
        # how much of the 6-D row above is arg-layout tax (a [..,64,4]
        # minor-dims operand tile-pads 4 -> 128 lanes on TPU)
        mod = _PatchEmbed(e, p, dtype=dt)
        x6 = jax.random.normal(key, (b, t, t, t, p**3, 4), dt)
        xf = x6.reshape(b, t, t, t, -1)
        _embed_rows(
            xf, "patch_embed_flat256_arg",
            lambda pr, xx, _m=mod, _p=p: _m.apply(
                pr, xx.reshape(*xx.shape[:4], _p**3, 4)),
        )

    # --- per-stage block pairs (shift 0 + shift w/2, the repeating unit) -
    for i, (heads, depth) in enumerate(zip(swin.num_heads, swin.depths)):
        dim = swin.stage_dims[i]
        g = t // 2**i
        name = f"stage{i}_pair_[{b},{g}^3,{dim}]"
        x = jax.random.normal(key, (b, g, g, g, dim), dt)
        if want(name):
            w = swin.window_size
            shift = tuple(s // 2 for s in w)
            b0 = SwinBlock3D(dim=dim, num_heads=heads, window=tuple(w),
                             shift=(0, 0, 0), dtype=dt)
            b1 = SwinBlock3D(dim=dim, num_heads=heads, window=tuple(w),
                             shift=shift, dtype=dt)
            p0, p1 = b0.init(key, x), b1.init(key, x)

            def pair(ps, x, _b0=b0, _b1=b1):
                return _b1.apply(ps[1], _b0.apply(ps[0], x))

            fwd = timeit(jax.jit(pair), (p0, p1), x, reps=args.reps)
            bwd = timeit(_grad_fn(pair), (p0, p1), x, reps=args.reps)
            record(name, fwd, bwd)
        mname = f"merge{i}_[{b},{g}^3,{dim}]"
        if want(mname) and i < len(swin.depths) - 1:
            m = PatchMerging3D(dim=dim, dtype=dt)
            pm = m.init(key, x)
            fwd = timeit(jax.jit(m.apply), pm, x, reps=args.reps)
            bwd = timeit(_grad_fn(m.apply), pm, x, reps=args.reps)
            record(mname, fwd, bwd)

    # --- UNETR decoders + subpixel head ---------------------------------
    dims = swin.stage_dims
    for lvl, (ci, cs, gi) in enumerate(
        [(dims[3], dims[2], t // 8), (dims[2], dims[1], t // 4),
         (dims[1], dims[0], t // 2)]
    ):
        name = f"decoder{4 - lvl}_[{b},{gi}^3,{ci}]"
        if not want(name):
            continue
        mod = UnetrUpBlock3D(cs, dtype=dt)
        x = jax.random.normal(key, (b, gi, gi, gi, ci), dt)
        skip = jax.random.normal(key, (b, gi * 2, gi * 2, gi * 2, cs), dt)
        params = mod.init(key, x, skip)

        def app(params, x, _m=mod, _s=skip):
            return _m.apply(params, x, _s)

        fwd = timeit(jax.jit(app), params, x, reps=args.reps)
        bwd = timeit(_grad_fn(app), params, x, reps=args.reps)
        record(name, fwd, bwd)

    if want("subpixel"):
        mod = SubpixelHead3D(4, patch=p, dtype=dt)
        x = jax.random.normal(key, (b, t, t, t, e), dt)
        params = mod.init(key, x)

        def app(params, x, _m=mod):
            return _m.apply(params, x, patched=True)

        fwd = timeit(jax.jit(app), params, x, reps=args.reps)
        bwd = timeit(_grad_fn(app), params, x, reps=args.reps)
        record("subpixel_head_patched", fwd, bwd)

    # mae_loss and the optimizer are intentionally NOT benchmarked here:
    # the loss fuses into the step (~0 ms in-context, PERF.md) and a
    # standalone jit of the raw [B,T,T,T,p^3,4] operand forces a padded
    # T(8,128) layout that expands 500 MB to 15.6 GB (OOM) — the in-step
    # layout is fusion-chosen and never materializes that form. The
    # optimizer needs the full ~700-leaf param tree (bench.py's job).

    out = {"meta": meta, "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"rows": len(rows), "out": args.out}))


if __name__ == "__main__":
    main()
