#!/usr/bin/env python
"""Headline benchmark: Swin-B MAE3D pretraining throughput at 160^3.

Prints ONE JSON line:
  {"metric": "grids_per_sec_per_chip_swinb_mae3d_160", "value": N,
   "unit": "grids/s/chip", "vs_baseline": N}

The baseline is the estimated PyTorch A100 throughput of the reference's
pretraining step (README.md "~2 days, 8 A100, batch 32" with the multi-
dataset recipe implies ~3 grids/s/GPU for swin_b-class models; no number is
published in-repo — see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

BASELINE_GRIDS_PER_SEC = 3.0  # estimated reference A100 throughput (per GPU)


def main():
    try:  # persistent compile cache: warm re-runs skip the ~5 min compile
        cache_dir = os.path.expanduser("~/.cache/nerf_mae_tpu/xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from nerf_mae_tpu.config import MAEConfig, SWIN_PRESETS, TrainConfig
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
    value = None
    # batch 8/chip is the measured operating point (PERF.md); try it first —
    # larger batches OOM on v5e and each failed probe costs a ~5 min remote
    # compile
    for batch_size in (8 * n_chips, 4 * n_chips, 2 * n_chips, n_chips):
        try:
            trainer = MAETrainer(cfg, TrainConfig(batch_size=batch_size), 1000, mesh)
            state = trainer.init(jax.random.PRNGKey(0))
            batch = shard_batch(
                {
                    "grids": rng.rand(batch_size, 160, 160, 160, 4).astype(np.float32),
                    "sizes": np.full((batch_size, 3), 160, np.int32),
                },
                mesh,
            )
            state, m = trainer.train_step(state, batch)  # compile
            first_loss = float(m["loss"])  # host transfer = hard barrier
            assert np.isfinite(first_loss), first_loss
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                state, m = trainer.train_step(state, batch)
            # block via host transfer: block_until_ready through the remote
            # tunnel can ack at dispatch, not completion
            _ = float(m["loss"])
            dt = (time.perf_counter() - t0) / reps
            value = batch_size / dt / n_chips
            print(
                f"# batch={batch_size} step={dt*1000:.1f}ms -> "
                f"{value:.2f} grids/s/chip",
                file=sys.stderr,
            )
            break
        except Exception as e:  # OOM at this batch size -> try smaller
            print(f"# batch={batch_size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue

    if value is None:
        print(json.dumps({"metric": "grids_per_sec_per_chip_swinb_mae3d_160",
                          "value": 0.0, "unit": "grids/s/chip",
                          "vs_baseline": 0.0}))
        return

    print(json.dumps({
        "metric": "grids_per_sec_per_chip_swinb_mae3d_160",
        "value": round(value, 3),
        "unit": "grids/s/chip",
        "vs_baseline": round(value / BASELINE_GRIDS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
