"""Host↔device overlapped input pipeline.

The reference feeds its GPUs with torch DataLoader worker processes
(reference: nerf_mae/run_swin_mae3d.py:578-586 — num_workers=4,
pin_memory). The TPU-native equivalent here is a background-thread
prefetcher over the numpy batch iterators plus an optional worker pool for
per-scene assembly:

- per-scene work (pad-to-cube, augment) goes through native/collate.cpp via
  ctypes, which releases the GIL — a thread pool genuinely parallelizes it;
- `map_fn` (typically `shard_batch`, i.e. `jax.device_put`) runs on the
  prefetch thread, so host→device transfer of batch N+1 overlaps the device
  step on batch N;
- the queue is bounded (default depth 2 = classic double buffering) so a
  slow consumer never piles up host memory.

With a ~500 ms device step and >1 s single-threaded batch assembly on a
1-core host (PERF.md finding 5), this is the difference between the TPU
idling half the time and running back-to-back.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

_SENTINEL = object()


class PrefetchIterator:
    """Wraps an iterator; a daemon thread keeps `depth` items ready.

    Exceptions raised by the source iterator (or map_fn) are re-raised in
    the consumer at the next `__next__`. `close()` (also called by
    `__exit__` and on exhaustion) stops the thread promptly even if the
    consumer abandons the iterator mid-epoch.
    """

    def __init__(
        self,
        source: Iterator,
        depth: int = 2,
        map_fn: Optional[Callable] = None,
    ):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._source = source
        self._map_fn = map_fn
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._source:
                if self._map_fn is not None:
                    item = self._map_fn(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # propagated to the consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self.close()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the producer's blocked put() can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def prefetch(
    source: Iterator, depth: int = 2, map_fn: Optional[Callable] = None
) -> PrefetchIterator:
    """Background-thread prefetch of `depth` items; map_fn (e.g. shard_batch)
    runs on the prefetch thread so device_put overlaps the device step."""
    return PrefetchIterator(source, depth=depth, map_fn=map_fn)


class ScenePool:
    """Thread pool for per-scene batch assembly.

    map(fn, indices) preserves order. Per-scene work dominated by
    native/collate.cpp (ctypes, GIL released) or numpy copies scales with
    threads; pure-python datasets degrade gracefully to ~serial.
    """

    def __init__(self, workers: int = 0):
        self._pool = ThreadPoolExecutor(workers) if workers > 0 else None

    def map(self, fn, items):
        if self._pool is None:
            return [fn(x) for x in items]
        return list(self._pool.map(fn, items))

    def close(self):
        # wait=True: the pool is idle between map() calls, so the join is
        # instant — and long finetune runs don't accumulate zombie threads
        if self._pool is not None:
            self._pool.shutdown(wait=True)
