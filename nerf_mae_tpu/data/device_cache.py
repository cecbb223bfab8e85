"""Device-resident dataset cache: batching as an on-device gather.

When the training corpus is *fixed* (no fresh augmentation per epoch) and
fits in spare HBM, upload it ONCE and turn per-step batching into a jitted
gather: the only per-step host->device traffic is the [B] int32 index
vector. On hosts where the device link is the bottleneck (PCIe, or this
environment's ~19 MB/s tunnel) this removes the input pipeline from the
critical path entirely — a batch of 8 bf16 160^3 grids is 131 MB (~7 s
through the tunnel) vs 32 bytes of indices.

This is the TPU-idiomatic analogue of tf.data's cache() pushed all the way
into HBM. The reference has no counterpart — its DataLoader re-reads and
re-pads .npz scenes every epoch (reference: nerf_rpn/datasets.py:88-101,
nerf_mae/run_swin_mae3d.py:578-586).

Memory math: corpus bytes = N * R^3 * C * itemsize. 128 scenes at
160^3 x 4ch bf16 = 4.2 GB — fits one v5e's 16 GB HBM next to a swin_s
train state at batch 8. Float32 grid leaves are downcast on the host
before upload (same `transfer_dtype` contract as parallel.shard_batch:
grid tensors only; small metadata like gt boxes stays float32 because
quantization can degenerate them).

Sharding: every leaf is uploaded replicated over the `data` axis (one copy
per chip on a multi-chip mesh — batching gathers arbitrary indices, which
would otherwise be an all-to-all). On a [data, space] mesh, grid-like
leaves (ndim >= 4) are stored AND served sharded over `space`, so the
corpus cache composes with spatial (grid) parallelism.

Not compatible with per-epoch host augmentation (flips/rot90/rot-scale
draw fresh randomness each visit) — the drivers guard that. The
patch-major host layout composes: the corpus is drained already
patch-major and stored channel-flat ([N,T,T,T,p^3*C] — the TPU-preferred
argument layout, see ops.maybe_unflatten_patches), so every gather serves
batches with zero per-step relayout; the first spatial dim stays axis 1,
so the [data, space] store/serve specs below apply unchanged.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, Optional

import numpy as np

log = logging.getLogger(__name__)


def corpus_from_iterator(batches) -> Dict[str, np.ndarray]:
    """Drain a host batch iterator (one epoch: loop=False, drop_last=False)
    and concatenate along the batch axis into one corpus dict."""
    chunks = list(batches)
    if not chunks:
        raise ValueError("corpus_from_iterator: empty iterator")
    return {
        k: (chunks[0][k] if len(chunks) == 1
            else np.concatenate([c[k] for c in chunks], axis=0))
        for k in chunks[0]
    }


def corpus_nbytes(corpus: Dict[str, np.ndarray],
                  transfer_dtype: Optional[str] = None) -> int:
    """Device bytes the corpus will occupy after the grid-leaf downcast."""
    total = 0
    for v in corpus.values():
        itemsize = v.dtype.itemsize
        if (transfer_dtype and transfer_dtype != "float32"
                and v.dtype == np.float32 and v.ndim >= 4):
            itemsize = 2
        total += v.size * itemsize
    return total


def device_corpus_batches(
    corpus: Dict[str, np.ndarray],
    mesh,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    loop: bool = True,
    drop_last: bool = True,
    transfer_dtype: Optional[str] = None,
) -> Iterator[Dict]:
    """Yield on-device batches gathered from a device-resident corpus.

    Same epoch semantics as data.mae_batch_iterator (host RNG permutation
    per epoch, drop ragged tail); the yielded dict has the same keys as the
    host iterator that assembled the corpus, already placed with the
    shardings a trainer expects (grids P('data'[, 'space']), metadata
    P('data')) — feed it straight to train_step, no shard_batch needed.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_mae_tpu.parallel.mesh import is_spatial

    n = len(next(iter(corpus.values())))
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > corpus size {n}")

    if transfer_dtype and transfer_dtype != "float32":
        import ml_dtypes

        td = dict(bfloat16=ml_dtypes.bfloat16,
                  float16=np.float16)[transfer_dtype]
        corpus = {
            k: v.astype(td)
            if v.dtype == np.float32 and v.ndim >= 4 else v
            for k, v in corpus.items()
        }

    # patch-major 6-D leaves are stored (and served) channel-flat
    # [N, T, T, T, p^3*C]: same bytes, but the gathered batch then enters
    # train_step in the flat argument layout the TPU prefers (see
    # parallel.shard_batch flatten_patches / ops.maybe_unflatten_patches)
    if os.environ.get("NERF_MAE_FLAT_TRANSFER", "1") == "1":
        corpus = {
            k: v.reshape(*v.shape[:4], -1) if v.ndim == 6 else v
            for k, v in corpus.items()
        }

    spatial = is_spatial(mesh)

    def _store_spec(v):
        # replicate over data; shard the first spatial dim over `space`
        return P(None, "space") if spatial and v.ndim >= 4 else P()

    def _batch_spec(v):
        return P("data", "space") if spatial and v.ndim >= 4 else P("data")

    log.info(
        "device corpus: %d scenes, %.2f GB on device (%s)",
        n, corpus_nbytes(corpus) / 2**30,
        ", ".join(f"{k}{list(v.shape)}" for k, v in corpus.items()),
    )
    dev = {
        k: jax.device_put(v, NamedSharding(mesh, _store_spec(v)))
        for k, v in corpus.items()
    }
    out_shardings = {
        k: NamedSharding(mesh, _batch_spec(v)) for k, v in corpus.items()
    }
    gather = jax.jit(
        lambda c, idx: {k: v[idx] for k, v in c.items()},
        out_shardings=out_shardings,
    )

    rng = np.random.RandomState(seed)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            sel = order[start:start + batch_size]
            if len(sel) < batch_size:
                if drop_last:
                    continue
                # static shapes: pad the tail by repeating the first index
                sel = np.concatenate(
                    [sel, np.full(batch_size - len(sel), sel[0], sel.dtype)])
            yield gather(dev, np.asarray(sel, np.int32))
        if not loop:
            return
