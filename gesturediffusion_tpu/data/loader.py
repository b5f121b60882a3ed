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
from queue import Queue
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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)

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
        return [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

    def __iter__(self) -> Iterator:
        batches = self._batches()
        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()
        error: list[BaseException] = []

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(
                            pool.map(self.dataset.__getitem__, batch_idx)
                        )
                        q.put(self.collate_fn(items))
            except BaseException as e:  # surface in the consumer, don't hang
                error.append(e)
            finally:
                q.put(None)

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
