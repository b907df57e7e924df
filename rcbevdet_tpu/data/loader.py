"""Threaded prefetching data loader with a DETERMINISTIC batch order.

Replaces the reference's torch DataLoader worker processes
(apis/train.py:195-210, workers_per_gpu=8): a background thread pool builds
batches ahead of device compute; the main thread transfers them to the mesh.

Ordering matters for multi-host training: every host must agree on which
logical batch is current (each host uploads only its shard — the analog of
the reference's DistributedGroupSampler rank split), so thread t produces
batches t, t+T, t+2T, ... into its own queue and the consumer round-robins
the queues — exact global order regardless of per-thread timing.

``local_slice=(start, size)`` makes the loader collate only this host's
sub-range of each global batch (see parallel/multihost.host_local_slice);
the global index schedule is still computed identically on every host from
the shared seed.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

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
        local_slice: Optional[Tuple[int, int]] = None,
        transform=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = list(indices) if indices is not None else list(
            range(len(dataset))
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.num_threads = max(1, num_threads)
        self.rng = np.random.default_rng(seed)
        if local_slice is not None:
            start, size = local_slice
            assert 0 <= start and start + size <= batch_size
        self.local_slice = local_slice
        # post-collate batch transform, run in the worker threads (e.g.
        # models/view_transformer.make_lss_pool_transform attaching the
        # train-pool chunk tables — the np.argsort-heavy host precompute
        # belongs in the prefetch pool, not the device-feeding thread)
        self.transform = transform
        # optional externally-provided batch schedule (list of global index
        # lists), e.g. from data/samplers.py InfiniteGroupStreamSampler —
        # overrides the shuffled schedule for the next iteration(s)
        self.batch_schedule = None

    def __len__(self):
        n = len(self.indices) // self.batch_size
        if not self.drop_last and len(self.indices) % self.batch_size:
            n += 1
        return n

    def _batches(self) -> List[List[int]]:
        """Global batch schedule — identical on every host (seeded rng)."""
        if self.batch_schedule is not None:
            out = [list(b) for b in self.batch_schedule]
        else:
            idx = list(self.indices)
            if self.shuffle:
                self.rng.shuffle(idx)
            out = [
                idx[i : i + self.batch_size]
                for i in range(0, len(idx), self.batch_size)
            ]
            if self.drop_last and out and len(out[-1]) < self.batch_size:
                out.pop()
        if self.local_slice is not None:
            start, size = self.local_slice
            out = [b[start : start + size] for b in out]
        return out

    def __iter__(self) -> Iterator[dict]:
        batches = self._batches()
        nt = min(self.num_threads, max(len(batches), 1))
        # one bounded queue per thread; thread t owns batches t::nt so the
        # consumer's round-robin read reproduces the global order exactly
        queues = [queue.Queue(maxsize=self.prefetch) for _ in range(nt)]
        stop = threading.Event()

        def worker(tid: int):
            try:
                for b in batches[tid::nt]:
                    if stop.is_set():
                        return
                    batch = collate_samples([self.dataset[i] for i in b])
                    if self.transform is not None:
                        batch = self.transform(batch)
                    queues[tid].put(batch)
            finally:
                queues[tid].put(None)

        threads = [
            threading.Thread(target=worker, args=(t,), daemon=True)
            for t in range(nt)
        ]
        for t in threads:
            t.start()
        try:
            done = [False] * nt
            i = 0
            while not all(done):
                tid = i % nt
                i += 1
                if done[tid]:
                    continue
                item = queues[tid].get()
                if item is None:
                    done[tid] = True
                    continue
                yield item
        finally:
            stop.set()
            # drain so producers blocked on put() can see the stop flag
            for q in queues:
                while True:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
