"""Device-resident corpus cache (data/device_cache.py): batching as jitted
on-device gathers. Parity with the host iterators it replaces, sharding
layout on 1-D and [data, space] meshes, and the driver guard rails."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

# all quick except the compile-heavy MAE train_step integration test

from nerf_mae_tpu.data.datasets import mae_batch_iterator, synthetic_scenes
from nerf_mae_tpu.data.device_cache import (
    corpus_from_iterator,
    corpus_nbytes,
    device_corpus_batches,
)
from nerf_mae_tpu.parallel import make_mesh, make_mesh_2d


class _DS:
    def __init__(self, scenes):
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i):
        return {"rgbsigma": self.scenes[i]}


def _dataset(n=10, r=8, seed=0):
    return _DS(synthetic_scenes(n, r, seed, min_size=r))


@pytest.mark.quick
def test_corpus_from_iterator_concatenates_ragged_epoch():
    ds = _dataset(n=10)
    corpus = corpus_from_iterator(
        mae_batch_iterator(ds, 4, 8, shuffle=False, loop=False,
                           drop_last=False))
    # 10 scenes -> batches of 4, 4, 2 concatenated back to 10
    assert corpus["grids"].shape == (10, 8, 8, 8, 4)
    assert corpus["sizes"].shape == (10, 3)
    np.testing.assert_array_equal(corpus["grids"][9, ..., 0],
                                  ds[9]["rgbsigma"][..., 0])


@pytest.mark.quick
def test_corpus_from_iterator_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        corpus_from_iterator(iter([]))


@pytest.mark.quick
def test_corpus_nbytes_counts_grid_downcast():
    corpus = {
        "grids": np.zeros((4, 8, 8, 8, 4), np.float32),
        "gt": np.zeros((4, 16, 6), np.float32),  # metadata: stays f32
        "sizes": np.zeros((4, 3), np.int32),
    }
    full = corpus_nbytes(corpus)
    half = corpus_nbytes(corpus, transfer_dtype="bfloat16")
    assert full == 4 * 512 * 4 * 4 + 4 * 16 * 6 * 4 + 4 * 3 * 4
    assert half == 4 * 512 * 4 * 2 + 4 * 16 * 6 * 4 + 4 * 3 * 4


@pytest.mark.quick
def test_gather_matches_host_iterator_exactly():
    """Same seed => device_corpus_batches replays the host iterator's epoch
    permutation, so training under --device_data sees the identical batch
    stream (modulo dtype)."""
    ds = _dataset(n=9)
    corpus = corpus_from_iterator(
        mae_batch_iterator(ds, 4, 8, shuffle=False, loop=False,
                           drop_last=False))
    mesh = make_mesh(1)
    dev = device_corpus_batches(corpus, mesh, 4, seed=3)
    host = mae_batch_iterator(ds, 4, 8, shuffle=True, seed=3)
    for _ in range(5):  # crosses an epoch boundary (9 scenes / batch 4)
        db, hb = next(dev), next(host)
        np.testing.assert_allclose(np.asarray(db["grids"]), hb["grids"])
        np.testing.assert_array_equal(np.asarray(db["sizes"]), hb["sizes"])


@pytest.mark.quick
def test_one_epoch_tail_padding_and_coverage():
    ds = _dataset(n=6)
    corpus = corpus_from_iterator(
        mae_batch_iterator(ds, 4, 8, shuffle=False, loop=False,
                           drop_last=False))
    mesh = make_mesh(1)
    out = list(device_corpus_batches(corpus, mesh, 4, shuffle=False,
                                     loop=False, drop_last=False))
    assert len(out) == 2
    # static shapes: the ragged tail [4, 5] is padded by repeating index 4
    tail = np.asarray(out[1]["grids"])
    np.testing.assert_allclose(tail[0], corpus["grids"][4])
    np.testing.assert_allclose(tail[1], corpus["grids"][5])
    np.testing.assert_allclose(tail[2], corpus["grids"][4])
    np.testing.assert_allclose(tail[3], corpus["grids"][4])


@pytest.mark.quick
def test_transfer_dtype_downcasts_grids_only():
    corpus = {
        "grids": np.random.rand(4, 8, 8, 8, 4).astype(np.float32),
        "gt_boxes": np.random.rand(4, 16, 6).astype(np.float32),
        "sizes": np.full((4, 3), 8, np.int32),
    }
    mesh = make_mesh(1)
    b = next(device_corpus_batches(corpus, mesh, 2,
                                   transfer_dtype="bfloat16"))
    assert str(b["grids"].dtype) == "bfloat16"
    assert b["gt_boxes"].dtype == np.float32  # ndim < 4: metadata kept f32
    assert b["sizes"].dtype == np.int32


@pytest.mark.quick
def test_batch_size_larger_than_corpus_raises():
    corpus = {"grids": np.zeros((2, 8, 8, 8, 4), np.float32)}
    with pytest.raises(ValueError, match="corpus size"):
        next(device_corpus_batches(corpus, make_mesh(1), 4))


@pytest.mark.quick
def test_data_mesh_sharding_layout():
    corpus = {
        "grids": np.random.rand(8, 8, 8, 8, 4).astype(np.float32),
        "sizes": np.full((8, 3), 8, np.int32),
    }
    mesh = make_mesh()  # all 8 virtual devices
    b = next(device_corpus_batches(corpus, mesh, 8))
    assert b["grids"].sharding.spec == P("data")
    assert b["sizes"].sharding.spec == P("data")


@pytest.mark.quick
def test_spatial_mesh_store_and_batch_sharding():
    """[data, space] mesh: grid leaves are stored sharded over `space` and
    served P('data', 'space'); metadata stays P('data')."""
    corpus = {
        "grids": np.random.rand(8, 8, 8, 8, 4).astype(np.float32),
        "sizes": np.full((8, 3), 8, np.int32),
    }
    mesh = make_mesh_2d(None, 2)  # data=4, space=2
    it = device_corpus_batches(corpus, mesh, 4, shuffle=False)
    b = next(it)
    assert b["grids"].sharding.spec == P("data", "space")
    assert b["sizes"].sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(b["grids"]), corpus["grids"][:4])


def test_mae_train_step_consumes_device_batches():
    """End-to-end: the MAE trainer trains straight off the gathered batches
    (no shard_batch hop) on an 8-device data mesh."""
    from nerf_mae_tpu.config import MAEConfig, SwinConfig, TrainConfig
    from nerf_mae_tpu.train.trainer import MAETrainer

    cfg = MAEConfig(
        swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                        num_heads=(3, 6, 12, 24)),
        resolution=32, compute_dtype="float32", remat=False,
    )
    mesh = make_mesh()
    trainer = MAETrainer(cfg, TrainConfig(batch_size=8, lr=1e-3), 4, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    ds = _DS(synthetic_scenes(8, 32, 0, min_size=32))
    corpus = corpus_from_iterator(
        mae_batch_iterator(ds, 8, 32, shuffle=False, loop=False,
                           drop_last=False))
    batches = device_corpus_batches(corpus, mesh, 8)
    for _ in range(2):
        state, m = trainer.train_step(state, next(batches))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.quick
def test_driver_guard_rejects_augmentation():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from common import make_train_batches

    class A:
        device_data = True
        flip_prob = 0.5
        rotate_prob = 0.0
        rot_scale_prob = 0.0
        patch_major_input = False
        batch_size = 2
        seed = 0
        prefetch = 0
        transfer_dtype = "float32"

    with pytest.raises(SystemExit, match="augmentation"):
        make_train_batches(A(), make_mesh(1), lambda: iter([]))


@pytest.mark.quick
def test_patch_major_corpus_gathers_and_matches_host_layout():
    """--device_data + patch-major (the r4 default train path): the corpus
    is stored channel-flat [N,T,T,T,p^3*C] (the TPU-preferred argument
    layout) and every gather serves the host iterator's data bit-for-bit
    (a free reshape apart), on both mesh shapes."""
    ds = _dataset(n=8, r=8)
    host = list(mae_batch_iterator(ds, 8, 8, shuffle=False, loop=False,
                                   drop_last=False, patch_major=4))
    corpus = corpus_from_iterator(iter(host))
    assert corpus["grids"].shape == (8, 2, 2, 2, 64, 4)
    # data mesh: batch spans all 8 devices; [data=4, space=2]: batch 4
    for mesh, bs in ((make_mesh(), 8), (make_mesh_2d(None, 2), 4)):
        b = next(device_corpus_batches(corpus, mesh, bs, shuffle=False))
        assert b["grids"].shape == (bs, 2, 2, 2, 64 * 4)
        np.testing.assert_array_equal(
            np.asarray(b["grids"]).reshape(bs, 2, 2, 2, 64, 4),
            host[0]["grids"][:bs])


def test_mae_train_step_consumes_patch_major_device_batches():
    """End-to-end: the MAE trainer trains straight off patch-major gathered
    batches (ndim-6 dispatch) on the 8-device data mesh."""
    from nerf_mae_tpu.config import MAEConfig, SwinConfig, TrainConfig
    from nerf_mae_tpu.train.trainer import MAETrainer

    cfg = MAEConfig(
        swin=SwinConfig(embed_dim=12, depths=(1, 1, 2, 1),
                        num_heads=(3, 6, 12, 24)),
        resolution=32, compute_dtype="float32", remat=False,
    )
    mesh = make_mesh()
    trainer = MAETrainer(cfg, TrainConfig(batch_size=8, lr=1e-3), 4, mesh)
    state = trainer.init(jax.random.PRNGKey(0))
    ds = _DS(synthetic_scenes(8, 32, 0, min_size=32))
    corpus = corpus_from_iterator(
        mae_batch_iterator(ds, 8, 32, shuffle=False, loop=False,
                           drop_last=False,
                           patch_major=cfg.swin.patch_size[0]))
    batches = device_corpus_batches(corpus, mesh, 8)
    for _ in range(2):
        state, m = trainer.train_step(state, next(batches))
    assert np.isfinite(float(m["loss"]))
