"""Input-pipeline tests: prefetch iterator + threaded batch assembly.

The overlapped pipeline is the TPU-host counterpart of the reference's
DataLoader worker processes (reference: nerf_mae/run_swin_mae3d.py:578-586).
"""

import time

import numpy as np
import pytest

from nerf_mae_tpu.data.datasets import (
    detection_batch_iterator,
    mae_batch_iterator,
    synthetic_detection_scenes,
    synthetic_scenes,
)
from nerf_mae_tpu.data.pipeline import PrefetchIterator, prefetch

pytestmark = pytest.mark.quick


class _ListDS:
    def __init__(self, scenes):
        self.scenes = scenes

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i):
        s = self.scenes[i]
        return dict(s) if isinstance(s, dict) else {"rgbsigma": s}


def test_prefetch_preserves_order_and_values():
    src = [{"x": np.full((4,), i, np.float32)} for i in range(20)]
    got = list(prefetch(iter(src), depth=3))
    assert len(got) == 20
    for i, b in enumerate(got):
        np.testing.assert_array_equal(b["x"], src[i]["x"])


def test_prefetch_map_fn_runs_on_background_thread():
    import threading

    main = threading.get_ident()
    tids = []

    def mark(x):
        tids.append(threading.get_ident())
        return x * 2

    got = list(prefetch(iter([1, 2, 3]), depth=2, map_fn=mark))
    assert got == [2, 4, 6]
    assert all(t != main for t in tids)


def test_prefetch_propagates_source_exception():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        for _ in it:
            pass


def test_prefetch_close_stops_producer_promptly():
    produced = []

    def slow():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(slow(), depth=2)
    next(it)
    it.close()
    n = len(produced)
    time.sleep(0.2)
    # producer must stop within one queue slot of where it was at close
    assert len(produced) <= n + 2
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_context_manager():
    with prefetch(iter(range(5)), depth=1) as it:
        assert next(it) == 0
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_depth_validation():
    with pytest.raises(ValueError):
        PrefetchIterator(iter([]), depth=0)


def test_mae_iterator_workers_match_inline():
    ds = _ListDS(synthetic_scenes(6, 32, seed=3))
    a = list(mae_batch_iterator(ds, 2, 32, shuffle=False, loop=False, workers=0))
    b = list(mae_batch_iterator(ds, 2, 32, shuffle=False, loop=False, workers=3))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["grids"], y["grids"])
        np.testing.assert_array_equal(x["sizes"], y["sizes"])


def test_detection_iterator_workers_match_inline():
    ds = _ListDS(synthetic_detection_scenes(6, 32, seed=3))
    a = list(
        detection_batch_iterator(ds, 2, 32, max_gt=8, shuffle=False, loop=False,
                                 workers=0)
    )
    b = list(
        detection_batch_iterator(ds, 2, 32, max_gt=8, shuffle=False, loop=False,
                                 workers=3)
    )
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_prefetched_mae_iterator_end_to_end():
    ds = _ListDS(synthetic_scenes(5, 32, seed=1))
    it = prefetch(
        mae_batch_iterator(ds, 2, 32, shuffle=False, loop=False, workers=2),
        depth=2,
    )
    batches = list(it)
    assert len(batches) == 2  # drop_last
    assert batches[0]["grids"].shape == (2, 32, 32, 32, 4)


def test_shard_batch_transfer_dtype_casts_grids_only():
    """bf16 transfer downcasts only grid-like (ndim>=4) float tensors:
    quantizing gt boxes can make them degenerate (min==max -> log(0))."""
    import jax.numpy as jnp

    from nerf_mae_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(1)
    batch = {
        "grids": np.random.rand(2, 8, 8, 8, 4).astype(np.float32),
        "boxes": np.random.rand(2, 3, 6).astype(np.float32),
        "sizes": np.full((2, 3), 8, np.int32),
    }
    out = shard_batch(batch, mesh, transfer_dtype="bfloat16")
    assert out["grids"].dtype == jnp.bfloat16
    assert out["boxes"].dtype == jnp.float32
    assert out["sizes"].dtype == jnp.int32
    np.testing.assert_allclose(
        np.asarray(out["grids"], np.float32), batch["grids"],
        rtol=1e-2, atol=1e-2,
    )
    # default: nothing is touched
    out32 = shard_batch(batch, mesh)
    assert out32["grids"].dtype == jnp.float32


def test_shard_batch_flattens_patch_major_leaves():
    """Patch-major 6-D leaves travel channel-flat by default (the
    TPU-preferred jit-argument layout, ops.maybe_unflatten_patches);
    flatten_patches=False preserves the 6-D form, and dense 5-D grids
    are never touched."""
    from nerf_mae_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(1)
    gp = np.random.rand(2, 2, 2, 2, 64, 4).astype(np.float32)
    batch = {"grids": gp, "sizes": np.full((2, 3), 8, np.int32)}
    out = shard_batch(batch, mesh)
    assert out["grids"].shape == (2, 2, 2, 2, 256)
    np.testing.assert_array_equal(
        np.asarray(out["grids"]).reshape(gp.shape), gp)
    keep = shard_batch(batch, mesh, flatten_patches=False)
    assert keep["grids"].shape == gp.shape
    dense = shard_batch({"grids": np.zeros((2, 8, 8, 8, 4), np.float32)},
                        mesh)
    assert dense["grids"].shape == (2, 8, 8, 8, 4)


def test_optimizer_skips_nonfinite_updates():
    """A nan grad must not poison params through the global-norm clip:
    the guard zeroes the update (leaving only the tiny wd/momentum-decay
    effect of a zero-grad adamw step), and training continues."""
    import jax
    import jax.numpy as jnp

    from nerf_mae_tpu.config import TrainConfig
    from nerf_mae_tpu.train.optim import make_optimizer

    tx = make_optimizer(TrainConfig(lr=1e-2), total_steps=10)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)

    bad = {"w": jnp.array([1.0, jnp.nan, 1.0])}
    up, opt_state = tx.update(bad, opt_state, params)
    params2 = jax.tree.map(lambda p, u: p + u, params, up)
    assert np.isfinite(np.asarray(params2["w"])).all()
    np.testing.assert_allclose(np.asarray(params2["w"]),
                               np.asarray(params["w"]), rtol=1e-3)

    good = {"w": jnp.full((3,), 0.5)}
    up, opt_state = tx.update(good, opt_state, params2)
    params3 = jax.tree.map(lambda p, u: p + u, params2, up)
    assert np.isfinite(np.asarray(params3["w"])).all()
    # a real grad moves params by ~lr, far beyond the zero-grad wd shift
    assert float(jnp.abs(params3["w"] - params2["w"]).max()) > 1e-3


def test_clip_guard_matches_optax_clip_on_finite_grads():
    import jax.numpy as jnp
    import optax

    from nerf_mae_tpu.train.optim import clip_with_nonfinite_guard

    g = {"a": jnp.array([3.0, -4.0]), "b": jnp.full((2, 2), 0.7)}
    for max_norm in (0.1, 10.0):  # clipping and non-clipping regimes
        ours = clip_with_nonfinite_guard(max_norm)
        ref = optax.clip_by_global_norm(max_norm)
        u1, _ = ours.update(g, ours.init(g))
        u2, _ = ref.update(g, ref.init(g))
        for k in g:
            np.testing.assert_allclose(np.asarray(u1[k]), np.asarray(u2[k]),
                                       rtol=1e-6)
