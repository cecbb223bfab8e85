"""Detection trainer: jitted data-parallel steps for FCOSDetector.

Replaces the reference's run_fcos{,_pretrained}.py Trainer loop
(reference: nerf_rpn/run_fcos_pretrained.py:310-1014) — same optimization
recipe (AdamW + OneCycle + clip), loss = cls + reg + centerness with the
cross-chip normalizations arising implicitly from batch-global sums.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_mae_tpu.config import SwinConfig, TrainConfig
from nerf_mae_tpu.models.detector import FCOSDetector
from nerf_mae_tpu.models.fcos import FCOSConfig
from nerf_mae_tpu.train.optim import make_optimizer
from nerf_mae_tpu.train.trainer import TrainState

logger = logging.getLogger(__name__)

_BATCH_KEYS = ("grids", "sizes", "gt_boxes", "gt_valid")


@dataclasses.dataclass
class DetectionTrainer:
    swin: SwinConfig
    fcos: FCOSConfig
    train_cfg: TrainConfig
    total_steps: int
    mesh: Optional[Mesh] = None
    backbone: str = "swin_s"
    compute_dtype: str = "bfloat16"
    remat: bool = True
    output_objectness: bool = False

    def __post_init__(self):
        self.model = FCOSDetector(
            swin=self.swin,
            fcos=self.fcos,
            backbone=self.backbone,
            dtype=jnp.dtype(self.compute_dtype),
            remat=self.remat,
            output_objectness=self.output_objectness,
        )
        self.tx = make_optimizer(self.train_cfg, self.total_steps)
        rep = None
        batch_shard = None
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            batch_shard = {k: NamedSharding(self.mesh, P("data")) for k in _BATCH_KEYS}
        self.train_step: Callable = jax.jit(
            self._train_step,
            in_shardings=(rep, batch_shard) if self.mesh is not None else None,
            out_shardings=(rep, rep) if self.mesh is not None else None,
            donate_argnums=(0,),
        )
        self.predict_step: Callable = jax.jit(
            self._predict_step,
            in_shardings=(rep, batch_shard) if self.mesh is not None else None,
            out_shardings=rep if self.mesh is not None else None,
        )

    def init(self, rng: jax.Array) -> TrainState:
        r = self.fcos.resolution
        dummy = {
            "grids": jnp.zeros((1, r, r, r, 4)),
            "sizes": jnp.full((1, 3), r, jnp.int32),
            "gt_boxes": jnp.zeros(
                (1, self.fcos.max_gt, 7 if self.fcos.use_obb else 6)
            ),
            "gt_valid": jnp.zeros((1, self.fcos.max_gt), bool),
        }
        params = self.model.init(
            {"params": rng, "droppath": rng},
            dummy["grids"], dummy["sizes"], dummy["gt_boxes"], dummy["gt_valid"],
            True, True,
        )["params"]
        n = sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
        logger.info("initialized FCOSDetector(%s) with %d params", self.backbone, n)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            rng=rng,
        )
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    def graft_mae_trunk(self, state: TrainState, mae_params) -> TrainState:
        """Load a pretrained MAE trunk into the detector backbone
        (reference: feature_extractor.py:1155-1176)."""
        from nerf_mae_tpu.train.checkpoint import extract_trunk, load_trunk_into

        trunk = extract_trunk(mae_params)
        body = load_trunk_into(dict(state.params["body"]), trunk)
        params = dict(state.params)
        params["body"] = body
        return state.replace(params=params)

    def _train_step(
        self, state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p):
            loss, aux = self.model.apply(
                {"params": p},
                batch["grids"], batch["sizes"], batch["gt_boxes"],
                batch["gt_valid"], False, True,
                rngs={"droppath": rng},
            )
            return loss, aux

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

    def _predict_step(
        self, state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        return self.model.apply(
            {"params": state.params},
            batch["grids"], batch["sizes"], None, None, True, False,
        )
