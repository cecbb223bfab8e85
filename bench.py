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
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    _emit()
    os._exit(0 if _state["value"] else 1)


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

    from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS, TrainConfig
    from nerf_mae_tpu.flops import train_mfu
    from nerf_mae_tpu.parallel import make_mesh, shard_batch
    from nerf_mae_tpu.train.trainer import MAETrainer

    mesh = make_mesh()
    n_chips = mesh.size
    cfg = MAEConfig(
        swin=SWIN_PRESETS["swin_b"],
        resolution=160,
        compute_dtype="bfloat16",
        remat=True,
    )

    rng = np.random.RandomState(0)
    # NERF_MAE_PATCH_MAJOR=1: measure the host-pre-patchified input path
    # (dense patch embed; see the layout note in config.MAEConfig)
    patch_major = os.environ.get("NERF_MAE_PATCH_MAJOR", "0") == "1"
    # batch 8/chip is the measured operating point (PERF.md); try it first —
    # larger batches OOM on v5e and each failed probe costs a ~5 min remote
    # compile. Fallback probes run only while the budget allows.
    for probe_i, batch_size in enumerate(
        (8 * n_chips, 4 * n_chips, 2 * n_chips, n_chips)
    ):
        if probe_i and time.monotonic() - t_start > budget_s * 0.6:
            _state["phase"] = f"budget_exhausted_before_batch{batch_size}"
            break
        _state["phase"] = f"compile_batch{batch_size}"
        try:
            trainer = MAETrainer(cfg, TrainConfig(batch_size=batch_size), 1000, mesh)
            state = trainer.init(jax.random.PRNGKey(0))
            grids = rng.rand(batch_size, 160, 160, 160, 4).astype(np.float32)
            if patch_major:
                from nerf_mae_tpu.ops.patchify import patchify_np

                grids = patchify_np(grids, cfg.swin.patch_size[0])
            batch = shard_batch(
                {
                    "grids": grids,
                    "sizes": np.full((batch_size, 3), 160, np.int32),
                },
                mesh,
            )
            state, m = trainer.train_step(state, batch)  # compile
            first_loss = float(m["loss"])  # host transfer = hard barrier
            assert np.isfinite(first_loss), first_loss
            _state["phase"] = f"measure_batch{batch_size}"
            reps = 10
            if profile_dir:
                jax.profiler.start_trace(profile_dir)
            try:
                t0 = time.perf_counter()
                for _ in range(reps):
                    state, m = trainer.train_step(state, batch)
                # block via host transfer: block_until_ready through the
                # remote tunnel can ack at dispatch, not completion
                _ = float(m["loss"])
                dt = (time.perf_counter() - t0) / reps
            finally:
                # an open trace would make every fallback probe's
                # start_trace raise and turn a recoverable OOM into value 0
                if profile_dir:
                    jax.profiler.stop_trace()
                    print(f"# profiler trace -> {profile_dir}",
                          file=sys.stderr)
            value = batch_size / dt / n_chips
            _state.update(
                value=value,
                mfu=train_mfu(value, cfg),
                step_ms=dt * 1000,
                phase="done",
            )
            print(
                f"# batch={batch_size} step={dt*1000:.1f}ms -> "
                f"{value:.2f} grids/s/chip, MFU {_state['mfu']*100:.1f}%",
                file=sys.stderr,
            )
            break
        except Exception as e:  # OOM at this batch size -> try smaller
            print(f"# batch={batch_size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue

    _emit()


if __name__ == "__main__":
    main()
