"""Threaded prefetching data loader.

Replaces the reference's torch DataLoader worker processes
(apis/train.py:195-210, workers_per_gpu=8): a background thread pool builds
batches ahead of device compute; the main thread transfers them to the mesh.
Simple by design — the heavy lifting (jpeg decode, target rendering) is
NumPy/PIL inside the dataset, and prefetch depth hides it behind the train
step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .dataset import collate_samples


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        indices: Optional[Sequence[int]] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        num_threads: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = list(indices) if indices is not None else list(
            range(len(dataset))
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return n

    def _batches(self) -> List[List[int]]:
        idx = list(self.indices)
        if self.shuffle:
            self.rng.shuffle(idx)
        out = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and out and len(out[-1]) < self.batch_size:
            out.pop()
        return out

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker(batch_list):
            try:
                for b in batch_list:
                    if stop.is_set():
                        return
                    q.put(collate_samples([self.dataset[i] for i in b]))
            finally:
                q.put(None)

        # shard batch list over threads round-robin but preserve order via
        # a single producer when num_threads == 1; multi-thread keeps order
        # per-thread (order across threads is relaxed).
        if self.num_threads <= 1:
            t = threading.Thread(target=worker, args=(batches,), daemon=True)
            t.start()
            done = 0
            try:
                while done < 1:
                    item = q.get()
                    if item is None:
                        done += 1
                        continue
                    yield item
            finally:
                stop.set()
        else:
            shards = [batches[i :: self.num_threads] for i in range(self.num_threads)]
            threads = [
                threading.Thread(target=worker, args=(s,), daemon=True)
                for s in shards
            ]
            for t in threads:
                t.start()
            done = 0
            try:
                while done < len(threads):
                    item = q.get()
                    if item is None:
                        done += 1
                        continue
                    yield item
            finally:
                stop.set()
