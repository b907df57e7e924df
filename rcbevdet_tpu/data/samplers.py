"""Scene-group samplers (reference datasets/samplers/group_sampler.py).

Two analogs of the reference's distributed group samplers, re-designed for
the host-sliced JAX data path (every host computes the identical global
schedule from a shared seed and takes its own slice — no collective):

- ``DistributedGroupSampler`` (group_sampler.py:22-151): epoch-based
  sampling that keeps each group's samples CONTIGUOUS in the schedule and
  shuffles only the group order, partitioned evenly across replicas.
- ``InfiniteGroupStreamSampler`` (group_sampler.py:154-235,
  InfiniteGroupEachSampleInBatchSampler): every (replica, batch-slot) pair
  streams one scene's samples IN ORDER, moving to the next scene of its
  own strided view of an infinite shuffled group sequence when the scene
  ends.  This is the sequential-cache training feed (each slot sees a
  temporally continuous stream, pairing with the cached-BEV
  ``forward_cached`` path / serving.StreamServer).

Groups are nuScenes scenes: ``scene_flags`` derives the per-sample group
id from ``scene_token`` (the reference stores the same thing in
``dataset.flag``).
"""

from __future__ import annotations

import itertools
from typing import Iterator, List, Sequence

import numpy as np


def scene_flags(dataset) -> np.ndarray:
    """[N] int group id per sample: scenes in first-appearance order over
    the timestamp-sorted ``data_infos`` (so each group's samples are
    temporally ordered, like the reference's bevdet4d adjacency)."""
    ids = {}
    flags = np.empty(len(dataset.data_infos), np.int64)
    for i, info in enumerate(dataset.data_infos):
        tok = info["scene_token"]
        if tok not in ids:
            ids[tok] = len(ids)
        flags[i] = ids[tok]
    return flags


class DistributedGroupSampler:
    """Group-contiguous epoch schedule, sliced per replica.

    Mirrors the reference semantics (group_sampler.py:59-117): per epoch,
    shuffle the group order AND shuffle nothing within groups; pad the
    flattened schedule so it divides evenly; each replica takes a strided
    contiguous chunk.  ``set_epoch`` reseeds like the torch sampler.
    """

    def __init__(self, flags: Sequence[int], num_replicas: int = 1,
                 rank: int = 0, seed: int = 0):
        self.flags = np.asarray(flags)
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.epoch = 0
        self.groups = [
            np.flatnonzero(self.flags == g)
            for g in range(int(self.flags.max()) + 1)
        ]
        total = len(self.flags)
        self.num_samples = -(-total // num_replicas)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(len(self.groups))
        sched = np.concatenate([self.groups[g] for g in order])
        pad = self.num_samples * self.num_replicas - len(sched)
        if pad:
            sched = np.concatenate([sched, sched[:pad]])
        start = self.rank * self.num_samples
        return iter(sched[start:start + self.num_samples].tolist())


class InfiniteGroupStreamSampler:
    """Per-slot continuous scene streaming.

    Every global slot (replica r, local slot s -> r*batch_size + s) owns a
    strided view of one infinite shuffled group sequence; a slot plays its
    current scene's samples in dataset order and pulls its next group when
    the scene is exhausted — exactly the reference's
    InfiniteGroupEachSampleInBatchSampler (group_sampler.py:204-228).

    ``__iter__`` yields local batches (lists of ``batch_size`` sample
    indices) forever; bound it with itertools.islice or ``take``.
    """

    def __init__(self, flags: Sequence[int], batch_size: int,
                 num_replicas: int = 1, rank: int = 0, seed: int = 0):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.groups_num = int(self.flags.max()) + 1
        self.global_batch_size = batch_size * num_replicas
        assert self.groups_num >= self.global_batch_size, (
            "need at least one scene per global batch slot"
        )
        self.group_to_samples = {
            g: np.flatnonzero(self.flags == g).tolist()
            for g in range(self.groups_num)
        }
        self._streams = [
            self._group_stream(rank * batch_size + s)
            for s in range(batch_size)
        ]
        self._buffers: List[List[int]] = [[] for _ in range(batch_size)]

    def _infinite_groups(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            yield from rng.permutation(self.groups_num).tolist()

    def _group_stream(self, global_slot: int) -> Iterator[int]:
        return itertools.islice(
            self._infinite_groups(), global_slot, None,
            self.global_batch_size,
        )

    def __iter__(self) -> Iterator[List[int]]:
        while True:
            batch = []
            for s in range(self.batch_size):
                if not self._buffers[s]:
                    g = next(self._streams[s])
                    self._buffers[s] = list(self.group_to_samples[g])
                batch.append(self._buffers[s].pop(0))
            yield batch

    def take(self, n: int) -> List[List[int]]:
        """First ``n`` batches (e.g. one epoch-equivalent of steps)."""
        return list(itertools.islice(iter(self), n))
