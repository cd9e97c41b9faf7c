"""Batching + background prefetch — the host-side data plane.

Replaces torch's DataLoader (reference data/__init__.py:62-101): a
shuffling batcher with a thread-pool item fetcher and a bounded background
prefetch queue, so host decode/augment overlaps device compute. The native
C++ augmentation path (ffwm_tpu.data.native) plugs in transparently when
built.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack dict items into batched numpy arrays; non-arrays become lists."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def device_prefetch(iterable, place, depth: int = 2):
    """Yield ``place(item)`` for each item, running ``place`` (typically
    pad + ``shard_batch``, i.e. the H2D transfer) on a background thread
    ``depth`` items ahead — so host->device copies overlap device compute
    instead of serializing the step loop. The original item is yielded
    alongside (``(item, placed)``) for host-side fields like file names.

    The reference's torch DataLoader gets this for free from CUDA's async
    H2D + pinned-memory workers; under JAX the transfer starts at
    ``jax.device_put`` time, so starting it early is the whole trick.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def put(obj):
        # Bounded-wait put: if the consumer exits early (generator closed,
        # exception mid-loop) the queue stays full and a bare q.put would
        # block this thread forever, pinning depth+1 device-resident batches.
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                if not put((item, place(item))):
                    return
        except Exception as e:  # propagate to consumer
            put(e)
        finally:
            put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            got = q.get()
            if got is None:
                break
            if isinstance(got, Exception):
                raise got
            yield got
    finally:
        stop.set()


class DataLoader:
    """Iterates dict batches. max_dataset_size caps items per epoch like the
    reference CustomDatasetDataLoader (data/__init__.py:92-100)."""

    def __init__(self, dataset, batch_size: int = 8, shuffle: bool = True,
                 num_threads: int = 4, drop_last: bool = False,
                 max_dataset_size: Optional[int] = None,
                 prefetch: int = 2, seed: Optional[int] = None,
                 process_shard: Optional[tuple] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(num_threads, 1)
        self.drop_last = drop_last
        self.max_dataset_size = max_dataset_size or float("inf")
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        # (rank, count) for multi-host training: every process builds the
        # SAME permutation (callers must pass the same integer seed on all
        # hosts) and takes the rank-th stride, truncated to the common
        # length — hosts see disjoint data and identical epoch lengths (a
        # one-item mismatch would desynchronize the collectives).
        self.process_shard = process_shard
        if process_shard is not None and seed is None and shuffle:
            raise ValueError(
                "process_shard with shuffle requires an explicit seed: all "
                "hosts must build the same permutation to partition it")

    def _process_slice(self, idx: np.ndarray) -> np.ndarray:
        if self.process_shard is None:
            return idx
        rank, count = self.process_shard
        return idx[rank::count][:len(idx) // count]

    def __len__(self) -> int:
        n = min(len(self.dataset), self.max_dataset_size)
        if self.process_shard is not None:
            n = int(n) // self.process_shard[1]
        if self.drop_last:
            return int(n // self.batch_size)
        return int(-(-n // self.batch_size))

    def _index_batches(self) -> List[np.ndarray]:
        n = int(min(len(self.dataset), self.max_dataset_size))
        idx = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(idx)
        idx = self._process_slice(idx)
        n = len(idx)
        batches = [idx[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._index_batches()
        if self.prefetch <= 0:
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in batches:
                    yield collate(list(pool.map(self.dataset.__getitem__, b)))
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(obj):
            # bounded-wait put (same pattern as device_prefetch): a bare
            # q.put on the full queue would block this thread forever if
            # the consumer exits early, leaking the thread + its pool +
            # the queued batches for process lifetime
            while not stop.is_set():
                try:
                    q.put(obj, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not put(collate(list(
                                pool.map(self.dataset.__getitem__, b)))):
                            return
            except Exception as e:  # propagate to consumer
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
