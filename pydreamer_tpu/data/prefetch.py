"""Input pipeline parallelism: worker threads + device prefetch.

Counterpart of the reference's DataLoader-worker parallelism (reference:
train.py:137-141, SURVEY §2.15): each of ``num_workers`` workers runs an
independent SequentialDataset stream and every batch is tagged with its
worker id, so the learner can keep a separate TBTT state per stream. Workers
here are *threads*, not processes — the heavy lifting (npz decompress via
zlib, numpy slicing) releases the GIL, and thread workers let us hand numpy
arrays to JAX with zero IPC copies.

``prefetch_iterator`` keeps N batches in flight on the accelerator
(jax.device_put with an optional NamedSharding for SPMD input), the
host->device double-buffering that hides transfer latency behind the train
step (the TPU-idiomatic replacement for pin_memory/prefetch_factor).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from ..tools import logger

__all__ = ["ParallelLoader", "prefetch_iterator"]


class ParallelLoader:
    """N worker threads, each running its own dataset stream.

    ``make_dataset(worker_id)`` builds an independent iterator per worker
    (with its own RNG seed). Yields ``(batch, worker_id)`` tuples round-robin
    as they become ready. ``num_workers=0`` runs inline on the caller thread
    (the reference's ``data_workers: 0`` debug mode).

    ``strict_order=True`` yields workers in deterministic round-robin order
    (0, 1, ..., N-1, 0, ...) instead of arrival order. Required for
    multi-host SPMD training: every host must pair the SAME stream id with
    the same global step, or the per-stream TBTT states desync across the
    batch's host shards.
    """

    def __init__(self,
                 make_dataset: Callable[[int], Iterator[Dict[str, np.ndarray]]],
                 num_workers: int = 0,
                 queue_size: int = 4,
                 strict_order: bool = False):
        self.make_dataset = make_dataset
        self.num_workers = num_workers
        self.queue_size = queue_size
        self.strict_order = strict_order
        self._threads = []
        self._queues = []
        self._stop = threading.Event()

    def _worker(self, worker_id: int, q: queue.Queue):
        try:
            it = iter(self.make_dataset(worker_id))
            for batch in it:
                while not self._stop.is_set():
                    try:
                        q.put((batch, worker_id), timeout=1.0)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except Exception:
            logger.exception("Data worker %d crashed", worker_id)
            q.put((None, worker_id))  # poison pill -> raise in main

    def __iter__(self) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
        if self.num_workers == 0:
            for batch in iter(self.make_dataset(0)):
                yield batch, 0
            return
        self._stop.clear()
        if self.strict_order:
            # One queue per worker; consume round-robin.
            self._queues = [queue.Queue(maxsize=max(self.queue_size // self.num_workers, 1))
                            for _ in range(self.num_workers)]
        else:
            # One shared queue; consume in arrival order.
            self._queues = [queue.Queue(maxsize=self.queue_size)] * self.num_workers
        self._threads = [
            threading.Thread(target=self._worker, args=(i, self._queues[i]),
                             daemon=True, name=f"data-worker-{i}")
            for i in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()
        try:
            i = 0
            while True:
                batch, wid = self._queues[i % self.num_workers].get()
                if self.strict_order:
                    i += 1
                if batch is None:
                    raise RuntimeError(f"Data worker {wid} crashed")
                yield batch, wid
        finally:
            self.close()

    def close(self):
        self._stop.set()


def prefetch_iterator(iterator: Iterator[Any],
                      size: int = 2,
                      sharding: Optional[jax.sharding.Sharding] = None,
                      transform: Optional[Callable[[Any], Any]] = None) -> Iterator[Any]:
    """Keep ``size`` items in flight, device_put off the critical path.

    With a ``sharding``, arrays are laid out for the SPMD train step as they
    land (batch-sharded over the data axis); without one they go to the
    default device.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()
    _SENTINEL = object()

    def put(item):
        if transform is not None:
            item = transform(item)
        if sharding is not None:
            item = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding) if isinstance(
                    x, (np.ndarray, jax.Array)) else x, item)
        else:
            # numpy only: jax.Arrays from the transform are already placed
            # (possibly sharded/global) — re-putting would move them.
            item = jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
                item)
        return item

    def producer():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                q.put(put(item))
            q.put(_SENTINEL)
        except Exception as e:
            logger.exception("Prefetch producer crashed")
            q.put(e)

    t = threading.Thread(target=producer, daemon=True, name="prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
