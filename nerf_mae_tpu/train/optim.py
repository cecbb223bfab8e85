"""Optimizer / LR schedule factory.

Reproduces the reference recipe: grad-norm clip 0.1 + AdamW(lr, wd) under a
OneCycle schedule (reference: nerf_mae/run_swin_mae3d.py:588-600,665;
torch OneCycleLR defaults map onto optax.cosine_onecycle_schedule).
"""

from __future__ import annotations

import optax

from nerf_mae_tpu.config import TrainConfig


def make_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=cfg.lr,
        pct_start=cfg.onecycle_pct_start,
        div_factor=cfg.onecycle_div_factor,
        final_div_factor=cfg.onecycle_final_div_factor,
    )


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    if cfg.skip_nonfinite_updates:
        # torch's clip_grad_norm_ silently propagates a nan total-norm into
        # every parameter, permanently poisoning the run (reference:
        # run_fcos_pretrained.py:734 has error_if_nonfinite=False); here a
        # nonfinite grad skips the step instead and training continues.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx
