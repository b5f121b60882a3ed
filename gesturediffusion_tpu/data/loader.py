"""Threaded prefetching data loader (host-side parallelism).

Replaces the reference's torch `DataLoader(num_workers=8, drop_last=True)`
(reference: data_loaders/get_data.py:27-36) with a dependency-free
double-buffered thread-pool loader: item fetch + collate for batch k+1
overlaps device compute on batch k.  Numpy item fetch releases the GIL for
the heavy slicing/DSP, so threads are effective without process overhead.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Full, Queue
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable[[Sequence[dict]], object],
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 2,
        process_count: int = 1,
        process_index: int = 0,
    ):
        """`batch_size` is the GLOBAL batch.  Under multi-host training
        (process_count > 1) every process builds the same shuffled index
        sequence (shared seed) and loads only its contiguous slice of each
        global batch; `parallel.distributed.make_global_batch` assembles
        the sharded global array from the local shard."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)
        if process_count > 1:
            from gesturediffusion_tpu.parallel.distributed import (
                local_batch_slice,
            )

            if not drop_last:
                raise ValueError(
                    "process-sharded loading requires drop_last=True "
                    "(a short final batch would yield unequal or empty "
                    "local shards)"
                )
            # validates divisibility + process_index range
            self._local_slice = local_batch_slice(
                batch_size, process_count, process_index
            )
        else:
            self._local_slice = None
        self.process_count = process_count
        self.process_index = process_index

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if self._local_slice is not None:
            batches = [b[self._local_slice] for b in batches]
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batches()
        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list[BaseException] = []

        def put_or_stop(x) -> bool:
            """put that never deadlocks: gives up once the consumer has
            abandoned iteration (stop set + queue full) — a plain q.put
            would block forever on the final sentinel with prefetch=1."""
            while True:
                try:
                    q.put(x, timeout=0.1)
                    return True
                except Full:
                    if stop.is_set():
                        return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(
                            pool.map(self.dataset.__getitem__, batch_idx)
                        )
                        if not put_or_stop(self.collate_fn(items)):
                            return
            except BaseException as e:  # surface in the consumer, don't hang
                error.append(e)
            finally:
                put_or_stop(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while producer.is_alive():
                try:
                    q.get_nowait()
                except Exception:
                    break


def infinite_batches(loader: DataLoader) -> Iterator:
    """Cycle the loader forever (epoch boundary = reshuffle)."""
    while True:
        yield from loader
