"""Spatial (grid) sharding: the 3D analogue of context parallelism.

A [data, space] mesh shards the voxel grid's first spatial dimension across
devices; GSPMD inserts the halo exchanges for shifted-window rolls and
decoder convs from sharding annotations alone. This is a capability the
reference does not have (SURVEY §5 long-context: its scaling is purely
architectural) — it lifts the one-chip-HBM ceiling on resolution/model
size. Correctness gate: the sharded step computes the SAME numbers as the
single-device step."""

import jax
import numpy as np
import pytest

from nerf_mae_tpu.config import MAEConfig, SwinConfig, TrainConfig
from nerf_mae_tpu.parallel import (
    grid_pspec,
    make_mesh,
    make_mesh_2d,
    shard_batch,
)
from nerf_mae_tpu.train.trainer import MAETrainer

RES = 32


def _cfg(attention_impl="auto"):
    return MAEConfig(
        swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                        num_heads=(3, 6, 12, 24), stochastic_depth_prob=0.0,
                        attention_impl=attention_impl),
        resolution=RES, compute_dtype="float32", remat=False,
    )


def _batch(n=4, seed=0):
    rng = np.random.RandomState(seed)
    grids = rng.rand(n, RES, RES, RES, 4).astype(np.float32)
    sizes = np.full((n, 3), RES, np.int32)
    return {"grids": grids, "sizes": sizes}


def _run_steps(mesh, n_steps=2):
    trainer = MAETrainer(_cfg(), TrainConfig(batch_size=4), 50, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    batch = shard_batch(_batch(), mesh,
                        specs={"grids": grid_pspec(mesh)})
    out = []
    for _ in range(n_steps):
        state, m = trainer.train_step(state, batch)
        out.append({k: float(v) for k, v in m.items()})
    ev = trainer.eval_step(state, batch)
    out.append({k: float(v) for k, v in ev.items()})
    return out


@pytest.mark.quick
class TestMesh2D:
    def test_shapes_and_axes(self):
        mesh = make_mesh_2d(2, 4)
        assert mesh.axis_names == ("data", "space")
        assert mesh.shape == {"data": 2, "space": 4}
        assert grid_pspec(mesh) == jax.sharding.PartitionSpec(
            "data", "space")
        # 1-D and space=1 meshes keep the plain data spec
        assert grid_pspec(make_mesh(8)) == jax.sharding.PartitionSpec("data")
        assert grid_pspec(make_mesh_2d(8, 1)) == jax.sharding.PartitionSpec(
            "data")

    def test_too_many_devices_raises(self):
        with pytest.raises(RuntimeError, match="asked for"):
            make_mesh_2d(8, 2)

    def test_pallas_impl_rejected_on_spatial_mesh(self):
        mesh = make_mesh_2d(2, 4)
        with pytest.raises(ValueError, match="spatial sharding"):
            MAETrainer(_cfg("pallas"), TrainConfig(batch_size=4), 50, mesh)


@pytest.mark.quick
def test_shardy_decoder_cotangent_repro():
    """Minimal repro of the jax-0.9 Shardy partitioner miscompilation that
    forced the spatial trainer onto the legacy GSPMD partitioner: the
    cotangent of a space-REPLICATED operand feeding two chained strided
    ConvTranspose up-blocks comes back overcounted exactly n_space times
    (parameter grads stay correct). This asserts the legacy partitioner
    matches the 1-device gradient; if jax fixes Shardy, the trainer
    workaround (train/trainer.py) can be dropped."""
    import flax.linen as nn
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_mae_tpu.models.unetr import UnetrUpBlock3D

    rng = np.random.RandomState(0)
    E = 12
    x_np = rng.rand(2, 2, 2, 2, 4 * E).astype(np.float32)
    s1_np = rng.rand(2, 4, 4, 4, 2 * E).astype(np.float32)
    s0_np = rng.rand(2, 8, 8, 8, E).astype(np.float32)
    v_np = rng.rand(4 * E).astype(np.float32)

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x, s1, s0, v):
            x = x + v
            d = UnetrUpBlock3D(2 * E, dtype=jnp.float32, name="d3")(x, s1)
            d = UnetrUpBlock3D(E, dtype=jnp.float32, name="d2")(d, s0)
            return (d.astype(jnp.float32) ** 2).mean()

    mod = Two()
    params = jax.device_get(mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x_np), jnp.asarray(s1_np),
        jnp.asarray(s0_np), jnp.asarray(v_np)))

    def grad_v(mesh, shardy):
        old = jax.config.jax_use_shardy_partitioner
        jax.config.update("jax_use_shardy_partitioner", shardy)
        try:
            rep = NamedSharding(mesh, P())
            ds = NamedSharding(mesh, P("data"))
            xs = NamedSharding(mesh, P("data", "space"))
            g = jax.jit(
                jax.grad(lambda p, x, s1, s0, v: mod.apply(p, x, s1, s0, v),
                         argnums=4),
                in_shardings=(rep, ds, xs, xs, rep), out_shardings=rep)(
                jax.device_put(params, rep), jax.device_put(x_np, ds),
                jax.device_put(s1_np, xs), jax.device_put(s0_np, xs),
                jax.device_put(v_np, rep))
            return np.asarray(jax.device_get(g))
        finally:
            jax.config.update("jax_use_shardy_partitioner", old)

    ref = grad_v(make_mesh_2d(1, 1), True)
    legacy = grad_v(make_mesh_2d(2, 4), False)
    np.testing.assert_allclose(legacy, ref, rtol=1e-4, atol=1e-7)


# mid tier: full trainer compiles (~1-2 min each on 1 CPU core)
class TestSpatialDenseHeads:
    def test_voxel_sr_spatial_parity(self):
        """VoxelSR (the task whose 256^3/384^3 outputs first outgrow one
        chip) must train identically on a (2 data x 4 space) mesh."""
        from nerf_mae_tpu.train.head_trainer import VoxelSRTrainer

        rng = np.random.RandomState(1)
        batch_np = {
            "grids": rng.rand(4, RES, RES, RES, 4).astype(np.float32),
            "out_grids": rng.rand(4, 2 * RES, 2 * RES, 2 * RES, 4).astype(
                np.float32),
        }

        def run(mesh):
            tr = VoxelSRTrainer(_cfg(), TrainConfig(batch_size=4), 50, mesh,
                                out_resolution=2 * RES)
            state = tr.init(jax.random.PRNGKey(0))
            spec = grid_pspec(mesh)
            batch = shard_batch(batch_np, mesh,
                                specs={k: spec for k in batch_np})
            state, m = tr.train_step(state, batch)
            ev = tr.eval_step(state, batch)
            return {**{k: float(v) for k, v in m.items()},
                    **{"eval_" + k: float(v) for k, v in ev.items()}}

        old = jax.config.jax_use_shardy_partitioner
        try:
            ref = run(make_mesh(1))
            got = run(make_mesh_2d(2, 4))
        finally:
            jax.config.update("jax_use_shardy_partitioner", old)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=1e-5,
                                       err_msg=f"SR metric {k}")


# mid tier: three full MAETrainer compiles (~2-3 min on 1 CPU core)
class TestSpatialParity:
    def test_patch_major_spatial_parity(self):
        """Patch-major batches [B,T,T,T,p^3,4] (the default train layout and
        the --device_data storage layout) must compose with the [data, space]
        mesh: same train metrics and eval PSNR as the dense-grid batch on the
        same mesh. Pins the claim in scripts/common.py that grid_pspec's
        (batch, first-spatial) axes apply unchanged to the 6-D layout."""
        from nerf_mae_tpu.ops.patchify import patchify_np

        old = jax.config.jax_use_shardy_partitioner
        try:
            mesh = make_mesh_2d(2, 4)
            cfg = _cfg()
            p = cfg.swin.patch_size[0]
            trainer = MAETrainer(cfg, TrainConfig(batch_size=4), 50, mesh)
            dense_np = _batch()
            pm_np = {"grids": patchify_np(dense_np["grids"], p),
                     "sizes": dense_np["sizes"]}
            out = []
            for b_np in (dense_np, pm_np):
                state = trainer.init(jax.random.PRNGKey(0))
                batch = shard_batch(b_np, mesh,
                                    specs={"grids": grid_pspec(mesh)})
                state, m = trainer.train_step(state, batch)
                ev = trainer.eval_step(state, batch)
                out.append({**{k: float(v) for k, v in m.items()},
                            **{"eval_" + k: float(v) for k, v in ev.items()}})
            ref, got = out
            for k in ref:
                np.testing.assert_allclose(got[k], ref[k], rtol=2e-4,
                                           atol=1e-5, err_msg=f"metric {k}")
        finally:
            jax.config.update("jax_use_shardy_partitioner", old)

    def test_spatial_matches_single_device(self):
        """(2 data x 4 space) and (1 x 8 pure-spatial) must reproduce the
        1-device train metrics and eval PSNR bit-for-tolerance. The spatial
        trainer flips the partitioner config globally (Shardy workaround);
        restore it afterwards."""
        old = jax.config.jax_use_shardy_partitioner
        try:
            ref = _run_steps(make_mesh(1))
            for n_data, n_space in ((2, 4), (1, 8)):
                got = _run_steps(make_mesh_2d(n_data, n_space))
                for r, g in zip(ref, got):
                    for k in r:
                        assert np.isfinite(g[k]), (n_data, n_space, k, g)
                        np.testing.assert_allclose(
                            g[k], r[k], rtol=2e-4, atol=1e-5,
                            err_msg=f"mesh ({n_data},{n_space}) metric {k}")
        finally:
            jax.config.update("jax_use_shardy_partitioner", old)
