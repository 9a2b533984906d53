"""Batched, prefetching host loader feeding device-sharded batches.

Replaces the reference's `torch.utils.data.DataLoader(num_workers, pin_memory)`
(train.py:244-274) with a thread-pool pipeline (PIL decode releases the GIL)
and double-buffered prefetch so host IO overlaps device compute — the
host->device analogue of the reference's pinned-memory async copies.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

HOST_ONLY_KEYS = ("filename",)


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-item dicts into a batch dict; host-only keys become lists."""
    out: Dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if k in HOST_ONLY_KEYS:
            out[k] = vals
        else:
            out[k] = np.stack(vals)
    return out


class DataLoader:
    """Iterates shuffled batches; optional drop_last; worker thread pool."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._pool: Optional[ThreadPoolExecutor] = None

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = self._rng.permutation(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def _load_batch(self, indices) -> Dict[str, Any]:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        items = list(self._pool.map(self.dataset.__getitem__, indices))
        return collate(items)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for indices in self._batch_indices():
                    q.put(self._load_batch(indices))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is stop:
                break
            yield batch


def infinite_iterator(loader: DataLoader) -> Iterator[Dict[str, Any]]:
    """reference train.py:111-114."""
    while True:
        for batch in loader:
            yield batch
