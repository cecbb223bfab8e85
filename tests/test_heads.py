"""VoxelSR / VoxelSemantics head tests: shapes, loss semantics, grafting,
training signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_mae_tpu.config import MAEConfig, SwinConfig, TrainConfig
from nerf_mae_tpu.models.heads import (
    intersection_and_union,
    voxel_semantics_loss,
    voxel_sr_loss,
)
from nerf_mae_tpu.parallel import make_mesh, shard_batch
from nerf_mae_tpu.train.head_trainer import VoxelSemanticsTrainer, VoxelSRTrainer


def tiny_mae_cfg():
    return MAEConfig(
        swin=SwinConfig(embed_dim=12, depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24),
                        stochastic_depth_prob=0.0),
        resolution=32,
        compute_dtype="float32",
        remat=False,
    )


class TestVoxelSRLoss:
    def test_masked_rgb_mse(self):
        rs = np.random.RandomState(0)
        pred = jnp.asarray(rs.randn(1, 8, 8, 8, 4).astype(np.float32))
        tgt = jnp.asarray(rs.rand(1, 8, 8, 8, 4).astype(np.float32))
        loss, aux = voxel_sr_loss(pred, tgt)
        m = np.asarray(tgt[..., 3:] > 0.01, np.float32)
        want = ((np.asarray(pred[..., :3]) - np.asarray(tgt[..., :3])) ** 2 * m).sum() / m.sum()
        assert float(loss) == pytest.approx(want, rel=1e-5)
        assert np.isfinite(float(aux["psnr"]))

    def test_empty_target_no_nan(self):
        pred = jnp.zeros((1, 4, 4, 4, 4))
        tgt = jnp.zeros((1, 4, 4, 4, 4))
        loss, aux = voxel_sr_loss(pred, tgt)
        assert float(loss) == 0.0 and np.isfinite(float(aux["psnr"]))


class TestSemanticsLoss:
    def test_perfect_prediction_low_ce(self):
        rs = np.random.RandomState(0)
        target = jnp.asarray(rs.randint(0, 5, (1, 8, 8, 8)))
        logits = jax.nn.one_hot(target, 5) * 20.0
        loss, aux = voxel_semantics_loss(logits, target)
        assert float(aux["soft_miou"]) > 0.95
        # masked CE zeroes the logits at void voxels -> these contribute
        # log(5) each (reference masked_cross_entropy semantics)
        frac_void = float((np.asarray(target) == 0).mean())
        assert float(loss) == pytest.approx(frac_void * np.log(5), abs=0.01)

    def test_class_weights(self):
        target = jnp.ones((1, 4, 4, 4), jnp.int32)
        logits = jnp.zeros((1, 4, 4, 4, 3))
        w_hi = jnp.array([1.0, 10.0, 1.0])
        l1, _ = voxel_semantics_loss(logits, target, w_hi)
        l2, _ = voxel_semantics_loss(logits, target, None)
        # uniform logits: weighted mean == unweighted for single-class target
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)

    def test_intersection_and_union(self):
        pred = np.array([1, 1, 2, 2, 0])
        tgt = np.array([1, 2, 2, 2, 0])  # last voxel void -> excluded
        inter, union, area_t = intersection_and_union(pred, tgt, 3)
        assert inter[1] == 1 and inter[2] == 2
        assert union[1] == 2  # pred{1,1} ∪ tgt{1}
        assert union[2] == 3  # pred{2,2} ∪ tgt{2,2,2}
        assert area_t[2] == 3


class TestHeadTrainers:
    def test_voxel_sr_end_to_end(self):
        mesh = make_mesh(1)
        trainer = VoxelSRTrainer(
            tiny_mae_cfg(), TrainConfig(batch_size=2), 20, mesh, out_resolution=48
        )
        state = trainer.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = shard_batch(
            {
                "grids": rs.rand(2, 32, 32, 32, 4).astype(np.float32),
                "out_grids": rs.rand(2, 48, 48, 48, 4).astype(np.float32),
            },
            mesh,
        )
        losses = []
        for _ in range(6):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        ev = trainer.eval_step(state, batch)
        assert np.isfinite(float(ev["psnr"]))

    def test_voxel_semantics_end_to_end(self):
        mesh = make_mesh(1)
        trainer = VoxelSemanticsTrainer(
            tiny_mae_cfg(), TrainConfig(batch_size=2), 20, mesh, num_classes=5,
        )
        state = trainer.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = shard_batch(
            {
                "grids": rs.rand(2, 32, 32, 32, 4).astype(np.float32),
                "semantics": rs.randint(0, 5, (2, 32, 32, 32)).astype(np.int32),
            },
            mesh,
        )
        losses = []
        for _ in range(6):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        ev = trainer.eval_step(state, batch)
        assert ev["pred_labels"].shape == (2, 32, 32, 32)

    def test_graft_mae_into_sr(self):
        from nerf_mae_tpu.models.mae import SwinMAE3D

        cfg = tiny_mae_cfg()
        mesh = make_mesh(1)
        trainer = VoxelSRTrainer(cfg, TrainConfig(batch_size=1), 10, mesh,
                                 out_resolution=48)
        state = trainer.init(jax.random.PRNGKey(0))
        mae = SwinMAE3D(cfg)
        rng = jax.random.PRNGKey(9)
        mae_params = mae.init(
            {"params": rng, "mask": rng}, jnp.zeros((1, 32, 32, 32, 4)), True
        )["params"]
        grafted = trainer.graft_mae(state, mae_params)
        # trunk AND decoder4/3/2 must transfer
        for key in ("encoder", "decoder4", "decoder3", "decoder2"):
            np.testing.assert_array_equal(
                np.asarray(jax.tree.leaves(grafted.params["base"][key])[0]),
                np.asarray(jax.tree.leaves(mae_params[key])[0]),
            )
        # the new decoder1 stays freshly initialized
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(grafted.params["decoder1"])[0]),
            np.asarray(jax.tree.leaves(state.params["decoder1"])[0]),
        )
