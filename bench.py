#!/usr/bin/env python
"""Headline benchmark: Swin-B MAE3D pretraining throughput at 160^3.

Prints ONE JSON line:
  {"metric": "grids_per_sec_per_chip_swinb_mae3d_160", "value": N,
   "unit": "grids/s/chip", "vs_baseline": N, "mfu": ..., ...}

Guarantees a JSON line is emitted even under an external `timeout`:
SIGTERM/SIGINT are trapped and the best measurement so far (or an explicit
zero with a phase marker) is printed before exit. An internal wall-clock
budget (NERF_MAE_BENCH_BUDGET_S, default 1500 s) gates the fallback
batch-size probes so one slow cold compile cannot eat the whole run.

MFU is model-FLOPs utilization: analytic fwd GEMM FLOPs x3 (fwd+bwd,
remat recompute excluded — see nerf_mae_tpu/flops.py) against the 197
TFLOP/s bf16 peak of one v5e chip.

Multi-chip: with >1 device the same data-parallel step runs at batch
8 x n_chips over the full mesh; the JSON adds n_chips, value_total
(grids/s across the mesh) and scaling_efficiency (per-chip throughput vs
a same-config single-chip run measured in the same invocation). On the
1-chip environment this branch is covered by an 8-virtual-CPU-device
smoke test (tests/test_train.py) via the NERF_MAE_BENCH_* size overrides.

The baseline is the ESTIMATED PyTorch A100 throughput of the reference's
pretraining step (README.md "~2 days, 8 A100, batch 32" implies ~3
grids/s/GPU for swin_b-class models; no number is published in-repo — see
BASELINE.md). "baseline_basis": "estimate" marks this.

Optional: NERF_MAE_PROFILE_DIR=<dir> (or --profile_dir <dir>) captures a
jax.profiler trace of the timed reps — the TPU equivalent of the
reference's CUDA-event harness (reference:
nerf_rpn/run_fcos_pretrained.py:989-1014).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

BASELINE_GRIDS_PER_SEC = 3.0  # estimated reference A100 throughput (per GPU)
METRIC = "grids_per_sec_per_chip_swinb_mae3d_160"

_state = {"value": None, "mfu": None, "step_ms": None, "phase": "start",
          "n_chips": None, "value_total": None, "scaling_efficiency": None,
          "emitted": False}


def _emit():
    if _state["emitted"]:
        return
    _state["emitted"] = True
    value = _state["value"] or 0.0
    out = {
        "metric": METRIC,
        "value": round(value, 3),
        "unit": "grids/s/chip",
        "vs_baseline": round(value / BASELINE_GRIDS_PER_SEC, 3),
        "baseline_basis": "estimate",
        "phase": _state["phase"],
    }
    if _state["mfu"] is not None:
        out["mfu"] = round(_state["mfu"], 4)
    if _state["step_ms"] is not None:
        out["step_ms"] = round(_state["step_ms"], 1)
    if _state["n_chips"] and _state["n_chips"] > 1:
        out["n_chips"] = _state["n_chips"]
        if _state["value_total"] is not None:
            out["value_total"] = round(_state["value_total"], 3)
        if _state["scaling_efficiency"] is not None:
            out["scaling_efficiency"] = round(_state["scaling_efficiency"], 4)
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    _emit()
    os._exit(0 if _state["value"] else 1)


def _measure(cfg, mesh, batch_size, resolution, reps, patch_major,
             profile_dir=None):
    """One compile + timed run of the data-parallel train step on `mesh`.
    Returns (grids_per_sec_per_chip, step_seconds)."""
    from nerf_mae_tpu.config import TrainConfig
    from nerf_mae_tpu.parallel import shard_batch
    from nerf_mae_tpu.train.trainer import MAETrainer

    rng = np.random.RandomState(0)
    trainer = MAETrainer(cfg, TrainConfig(batch_size=batch_size), 1000, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    # NERF_MAE_BENCH_DEVICE_DATA=1: serve batches from a device-resident
    # corpus via the per-step jitted gather (the --device_data production
    # path) instead of one pre-placed host batch — times the step
    # *including* the gather and the gather-output->step jit boundary.
    device_data = os.environ.get("NERF_MAE_BENCH_DEVICE_DATA", "0") == "1"
    n_scenes = 2 * batch_size if device_data else batch_size
    grids = rng.rand(
        n_scenes, resolution, resolution, resolution, 4).astype(np.float32)
    if patch_major:
        from nerf_mae_tpu.ops.patchify import patchify_np

        grids = patchify_np(grids, cfg.swin.patch_size[0])
    sizes = np.full((n_scenes, 3), resolution, np.int32)
    if device_data:
        from nerf_mae_tpu.data.device_cache import device_corpus_batches

        it = device_corpus_batches(
            {"grids": grids, "sizes": sizes}, mesh, batch_size,
            transfer_dtype="bfloat16",
        )
        next_batch = lambda: next(it)
    else:
        fixed = shard_batch({"grids": grids, "sizes": sizes}, mesh)
        next_batch = lambda: fixed
    state, m = trainer.train_step(state, next_batch())  # compile
    first_loss = float(m["loss"])  # host transfer = hard barrier
    assert np.isfinite(first_loss), first_loss
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    try:
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = trainer.train_step(state, next_batch())
        # block via host transfer: block_until_ready through the
        # remote tunnel can ack at dispatch, not completion
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
    finally:
        # an open trace would make every fallback probe's start_trace
        # raise and turn a recoverable OOM into value 0
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"# profiler trace -> {profile_dir}", file=sys.stderr)
    return batch_size / dt / mesh.size, dt


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    budget_s = float(os.environ.get("NERF_MAE_BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()

    profile_dir = os.environ.get("NERF_MAE_PROFILE_DIR")
    i = sys.argv.index("--profile_dir") if "--profile_dir" in sys.argv else -1
    if 0 <= i < len(sys.argv) - 1:
        profile_dir = sys.argv[i + 1]

    try:  # persistent compile cache: warm re-runs skip the ~5 min compile
        cache_dir = os.path.expanduser("~/.cache/nerf_mae_tpu/xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS
    from nerf_mae_tpu.flops import train_mfu
    from nerf_mae_tpu.parallel import make_mesh

    # size overrides: the 8-virtual-device CPU smoke test shrinks the model
    # so the multi-chip branch is exercised end-to-end in seconds
    preset = os.environ.get("NERF_MAE_BENCH_PRESET", "swin_b")
    resolution = int(os.environ.get("NERF_MAE_BENCH_RESOLUTION", "160"))
    reps = int(os.environ.get("NERF_MAE_BENCH_REPS", "10"))
    per_chip = int(os.environ.get("NERF_MAE_BENCH_PER_CHIP_BATCH", "8"))
    full_size = preset == "swin_b" and resolution == 160

    # NERF_MAE_BENCH_SPACE=n: [data, space] mesh (spatial sharding; the
    # per-chip batch then applies to the data axis only)
    n_space = int(os.environ.get("NERF_MAE_BENCH_SPACE", "1"))
    if n_space > 1:
        from nerf_mae_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(None, n_space)
    else:
        mesh = make_mesh()
    n_chips = mesh.size
    _state["n_chips"] = n_chips
    cfg = MAEConfig(
        swin=SWIN_PRESETS[preset],
        resolution=resolution,
        compute_dtype="bfloat16" if full_size else "float32",
        remat=full_size,
    )

    # Patch-major host input is the default train path (dense patch embed;
    # measured 313.7 -> 258.0 ms on swin_b@160^3, r4 A/B — PERF.md).
    # NERF_MAE_PATCH_MAJOR=0 measures the dense-grid conv path instead.
    patch_major = os.environ.get("NERF_MAE_PATCH_MAJOR", "1") == "1"
    # batch 8/chip is the measured operating point (PERF.md); try it first —
    # larger batches OOM on v5e and each failed probe costs a ~5 min remote
    # compile. Fallback probes run only while the budget allows.
    n_data = n_chips // n_space
    probes = [b * n_data for b in (per_chip, per_chip // 2, per_chip // 4, 1)
              if b >= 1]
    for probe_i, batch_size in enumerate(dict.fromkeys(probes)):
        if probe_i and time.monotonic() - t_start > budget_s * 0.6:
            _state["phase"] = f"budget_exhausted_before_batch{batch_size}"
            break
        _state["phase"] = f"compile_batch{batch_size}"
        try:
            value, dt = _measure(cfg, mesh, batch_size, resolution, reps,
                                 patch_major, profile_dir)
            achieved_per_chip = max(batch_size // n_chips, 1)
            _state.update(
                value=value,
                mfu=train_mfu(value, cfg) if full_size else None,
                step_ms=dt * 1000,
                value_total=value * n_chips,
                phase="done",
            )
            print(
                f"# batch={batch_size} step={dt*1000:.1f}ms -> "
                f"{value:.2f} grids/s/chip x {n_chips} chips",
                file=sys.stderr,
            )
            break
        except Exception as e:  # OOM at this batch size -> try smaller
            print(f"# batch={batch_size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue

    # multi-chip scaling efficiency: same per-chip batch on ONE device
    # (sharded-vs-serial per-chip throughput ratio; 1.0 = perfect scaling)
    if (
        _state["value"]
        and n_chips > 1
        and time.monotonic() - t_start < budget_s * 0.85
    ):
        _state["phase"] = "single_chip_reference"
        try:
            v1, _ = _measure(cfg, make_mesh(1), achieved_per_chip, resolution,
                             reps, patch_major)
            _state["scaling_efficiency"] = float(_state["value"] / v1)
            print(f"# single-chip ref {v1:.2f} grids/s -> scaling eff "
                  f"{_state['scaling_efficiency']:.3f}", file=sys.stderr)
        except Exception as e:
            print(f"# single-chip reference failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        _state["phase"] = "done"

    _emit()


if __name__ == "__main__":
    main()
