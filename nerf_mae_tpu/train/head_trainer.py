"""Trainers for the dense downstream heads (VoxelSR, VoxelSemantics).

Replaces the reference's run_voxelSR.py / run_voxel_semantics.py Trainer
loops (reference: nerf_rpn/run_voxelSR.py:420-890,
run_voxel_semantics.py:426-1063) with jitted data-parallel steps.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_mae_tpu.config import MAEConfig, TrainConfig
from nerf_mae_tpu.models.heads import (
    VoxelSR3D,
    VoxelSemantics3D,
    voxel_semantics_loss,
    voxel_sr_loss,
)
from nerf_mae_tpu.train.optim import make_optimizer
from nerf_mae_tpu.train.trainer import TrainState

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _DenseHeadTrainer:
    mae_cfg: MAEConfig
    train_cfg: TrainConfig
    total_steps: int
    mesh: Optional[Mesh] = None

    def _jit(self, batch_keys):
        from nerf_mae_tpu.parallel.mesh import grid_pspec, prepare_spatial_config

        # spatial ([data, space]) meshes shard every [B, R, ...] batch
        # tensor's first spatial dim too — the SR task at 256^3/384^3
        # outputs (reference train_voxelSR.sh:11-12) is where per-sample
        # activations first outgrow one chip's HBM
        swin = prepare_spatial_config(self.mesh, self.mae_cfg.swin)
        if swin is not self.mae_cfg.swin:
            self.mae_cfg = dataclasses.replace(self.mae_cfg, swin=swin)
            self.model = self._build_model()
        rep = None
        batch_shard = None
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            batch_shard = {
                k: NamedSharding(self.mesh, grid_pspec(self.mesh))
                for k in batch_keys
            }
        self.train_step: Callable = jax.jit(
            self._train_step,
            in_shardings=(rep, batch_shard) if self.mesh is not None else None,
            out_shardings=(rep, rep) if self.mesh is not None else None,
            donate_argnums=(0,),
        )
        self.eval_step: Callable = jax.jit(
            self._eval_step,
            in_shardings=(rep, batch_shard) if self.mesh is not None else None,
            out_shardings=rep if self.mesh is not None else None,
        )

    def _init_state(self, rng, dummy_kwargs) -> TrainState:
        params = self.model.init({"params": rng, "droppath": rng}, **dummy_kwargs)[
            "params"
        ]
        n = sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
        logger.info("initialized %s with %d params", type(self.model).__name__, n)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            rng=rng,
        )
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    def graft_mae(self, state: TrainState, mae_params) -> TrainState:
        """Copy the pretrained MAE trunk AND decoder4/3/2 into `base`
        (reference: feature_extractor.py:2008-2012 — only decoder1/out/
        mask_token are re-initialized)."""
        from nerf_mae_tpu.models.heads import SR_TRUNK_KEYS
        from nerf_mae_tpu.train.checkpoint import load_trunk_into

        trunk = {k: mae_params[k] for k in SR_TRUNK_KEYS if k in mae_params}
        params = dict(state.params)
        params["base"] = load_trunk_into(dict(params["base"]), trunk)
        return state.replace(params=params)

    def _apply_update(self, state, loss_fn):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        metrics = dict(aux)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics


@dataclasses.dataclass
class VoxelSRTrainer(_DenseHeadTrainer):
    """batch: {"grids": [B, R, R, R, 4], "out_grids": [B, R_out^3, 4]}."""

    out_resolution: int = 256

    def _build_model(self):
        return VoxelSR3D(self.mae_cfg, out_resolution=self.out_resolution)

    def __post_init__(self):
        self.model = self._build_model()
        self.tx = make_optimizer(self.train_cfg, self.total_steps)
        self._jit(("grids", "out_grids"))

    def init(self, rng) -> TrainState:
        r = self.mae_cfg.resolution
        return self._init_state(
            rng, {"grids": jnp.zeros((1, r, r, r, 4)), "deterministic": True}
        )

    def _train_step(self, state, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p):
            pred = self.model.apply(
                {"params": p}, batch["grids"], False, rngs={"droppath": rng}
            )
            return voxel_sr_loss(pred, batch["out_grids"])

        return self._apply_update(state, loss_fn)

    def _eval_step(self, state, batch) -> Dict:
        pred = self.model.apply({"params": state.params}, batch["grids"], True)
        loss, aux = voxel_sr_loss(pred, batch["out_grids"])
        return {"loss": loss, **aux}


@dataclasses.dataclass
class VoxelSemanticsTrainer(_DenseHeadTrainer):
    """batch: {"grids": [B, R^3, 4], "semantics": [B, R^3] int labels}."""

    num_classes: int = 19
    class_weights: Optional[np.ndarray] = None

    def _build_model(self):
        return VoxelSemantics3D(self.mae_cfg, num_classes=self.num_classes)

    def __post_init__(self):
        self.model = self._build_model()
        self.tx = make_optimizer(self.train_cfg, self.total_steps)
        self._weights = (
            jnp.asarray(self.class_weights) if self.class_weights is not None else None
        )
        self._jit(("grids", "semantics"))

    def init(self, rng) -> TrainState:
        r = self.mae_cfg.resolution
        return self._init_state(
            rng, {"grids": jnp.zeros((1, r, r, r, 4)), "deterministic": True}
        )

    def _train_step(self, state, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p):
            logits = self.model.apply(
                {"params": p}, batch["grids"], False, rngs={"droppath": rng}
            )
            return voxel_semantics_loss(logits, batch["semantics"], self._weights)

        return self._apply_update(state, loss_fn)

    def _eval_step(self, state, batch) -> Dict:
        logits = self.model.apply({"params": state.params}, batch["grids"], True)
        loss, aux = voxel_semantics_loss(logits, batch["semantics"], self._weights)
        pred_labels = jnp.argmax(logits, axis=-1)
        return {"loss": loss, **aux, "pred_labels": pred_labels}
