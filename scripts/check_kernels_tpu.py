#!/usr/bin/env python
"""On-hardware numerics check: Pallas kernels vs the XLA composition.

The pytest kernel suites run the same kernel code in *interpret* mode
(CPU judge host); this script compiles the real Mosaic kernels on the TPU
and prints one JSON line with max abs/rel errors for:

  - fused whole-Swin-block fwd + input/param grads (C=32 small-C path and
    C=512 large-C path; shifted and unshifted; padded grid)
  - fused window attention fwd + grads

Run after perf-affecting kernel changes:
  python scripts/check_kernels_tpu.py          # on the TPU host
Writes runs/kernel_numerics_tpu.json unless --out is given.

Reference composition being compared against: models/swin.py XLA path
(reference semantics: nerf_mae/model/mae/swin_mae3d.py:27-369).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    from nerf_mae_tpu.ops.pallas_block import fused_swin_block

    return fused_swin_block(
        x, p["ln1_scale"], p["ln1_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"], p["ln2_scale"], p["ln2_bias"],
        p["fc1_kernel"], p["fc1_bias"], p["fc2_kernel"], p["fc2_bias"],
        p["bias_table"], keep_attn, keep_mlp, window, shift, heads, eps,
    )


def _errs(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    abs_err = float(np.abs(got - want).max())
    rel_err = float(
        (np.abs(got - want) / np.maximum(np.abs(want), 1e-3)).max()
    )
    # scale-aware error: max abs deviation over the tensor's own max
    # magnitude. Raw max_abs is meaningless across cases — C=512 grads are
    # ~100x larger than C=32 grads — and pointwise max_rel blows up at
    # near-zero entries. On TPU both paths round matmul inputs to bf16
    # passes (XLA default f32 precision = one bf16 pass; the MXU has no
    # true-f32 mode), so the comparison floor is bf16-rounding noise
    # proportional to the output scale, which this metric normalizes for.
    scale = float(np.abs(want).max())
    return {"max_abs": abs_err, "max_rel": rel_err,
            "rel_vs_max": abs_err / max(scale, 1e-30), "want_max": scale}


def main():
    out_path = "runs/kernel_numerics_tpu.json"
    i = sys.argv.index("--out") if "--out" in sys.argv else -1
    if 0 <= i < len(sys.argv) - 1:
        out_path = sys.argv[i + 1]

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    window, eps = (4, 4, 4), 1e-5
    key = jax.random.PRNGKey(0)

    cases = [
        ("block_c32_shift0", 32, 4, (0, 0, 0), (8, 8, 8), jnp.float32),
        ("block_c32_shift2", 32, 4, (2, 2, 2), (8, 8, 8), jnp.float32),
        ("block_c512_shift0", 512, 16, (0, 0, 0), (8, 8, 8), jnp.float32),
        ("block_c512_shift2", 512, 16, (2, 2, 2), (8, 8, 8), jnp.float32),
        # padded (non-multiple-of-window) grid exercises the in-kernel
        # pad-row masking
        ("block_c32_padded", 32, 4, (0, 0, 0), (6, 7, 5), jnp.float32),
        # bf16 compute dtype (the train config): the fused kernels run the
        # q@k / p@v dots with bf16 inputs + f32 accumulation, same as the
        # XLA path's einsums — compared here under identical input rounding
        ("block_c32_shift2_bf16", 32, 4, (2, 2, 2), (8, 8, 8), jnp.bfloat16),
        ("block_c512_shift0_bf16", 512, 16, (0, 0, 0), (8, 8, 8),
         jnp.bfloat16),
    ]
    i = sys.argv.index("--cases") if "--cases" in sys.argv else -1
    if 0 <= i < len(sys.argv) - 1:  # substring filter (CPU smoke / bisect)
        cases = [c for c in cases if sys.argv[i + 1] in c[0]]
    for name, c, heads, shift, grid, dt in cases:
        t0 = time.time()
        x = jax.random.normal(key, (2, *grid, c), jnp.float32).astype(dt)
        p = _params(jax.random.PRNGKey(1), c, heads, c * 4, 7 ** 3)
        ones = jnp.ones((2,), jnp.float32)

        f_fused = jax.jit(
            lambda x, p: _fused(x, p, window, shift, heads, eps, ones, ones)
        )
        f_xla = jax.jit(
            lambda x, p: _xla_block(x, p, window, shift, heads, eps, ones, ones)
        )
        fwd = _errs(f_fused(x, p), f_xla(x, p))

        def loss_fused(x, p):
            return (_fused(x, p, window, shift, heads, eps, ones, ones) ** 2).sum()

        def loss_xla(x, p):
            return (_xla_block(x, p, window, shift, heads, eps, ones, ones) ** 2).sum()

        gx_f, gp_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, p)
        gx_x, gp_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(x, p)
        bwd_x = _errs(gx_f, gx_x)
        flat_f = jax.tree_util.tree_leaves(gp_f)
        flat_x = jax.tree_util.tree_leaves(gp_x)
        bwd_p = {"max_abs": 0.0, "max_rel": 0.0, "rel_vs_max": 0.0}
        for a, b in zip(flat_f, flat_x):
            e = _errs(a, b)  # rel_vs_max is per-leaf, so a small-magnitude
            # leaf (e.g. a bias) is judged on its own scale
            for k in bwd_p:
                bwd_p[k] = max(bwd_p[k], e[k])
        results[name] = {"fwd": fwd, "grad_input": bwd_x,
                         "grad_params": bwd_p,
                         "dtype": jnp.dtype(dt).name,
                         "seconds": round(time.time() - t0, 1)}
        print(f"# {name}: fwd {fwd['rel_vs_max']:.2e} "
              f"din {bwd_x['rel_vs_max']:.2e} dp {bwd_p['rel_vs_max']:.2e} "
              f"(rel_vs_max; {results[name]['seconds']}s)", file=sys.stderr)

    def _thresh(v):
        # Gates are on rel_vs_max (deviation / target max magnitude).
        # f32 cases: both paths still round matmul inputs to bf16 on the
        # MXU but at different fusion points — measured ceiling ~2e-3 fwd
        # / ~2e-2 grads at C=512 (r5, runs/kernel_numerics_tpu.json).
        # bf16 cases round activations too; an order looser.
        loose = v.get("dtype") == "bfloat16"
        return (5e-2, 2e-1) if loose else (5e-3, 5e-2)

    ok = all(
        v["fwd"]["rel_vs_max"] < _thresh(v)[0]
        and v["grad_input"]["rel_vs_max"] < _thresh(v)[1]
        and v["grad_params"]["rel_vs_max"] < _thresh(v)[1]
        for k, v in results.items()
        if isinstance(v, dict) and "fwd" in v
    )
    results["ok"] = ok
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": ok, "cases": len(cases), "out": out_path}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
