"""Scene-group sampler tests (data/samplers.py vs the reference
datasets/samplers/group_sampler.py semantics)."""

import itertools

import numpy as np
import pytest

from rcbevdet_tpu.data.samplers import (
    DistributedGroupSampler,
    InfiniteGroupStreamSampler,
    scene_flags,
)


class _FakeDataset:
    def __init__(self, scene_lengths):
        self.data_infos = []
        for si, n in enumerate(scene_lengths):
            for _ in range(n):
                self.data_infos.append({"scene_token": f"scene{si}"})


def test_scene_flags_first_appearance_order():
    ds = _FakeDataset([3, 2, 4])
    f = scene_flags(ds)
    np.testing.assert_array_equal(f, [0, 0, 0, 1, 1, 2, 2, 2, 2])


def test_distributed_group_sampler_partitions_and_contiguity():
    flags = np.asarray([0] * 3 + [1] * 2 + [2] * 4 + [3] * 3)
    parts = [
        list(DistributedGroupSampler(flags, num_replicas=3, rank=r, seed=7))
        for r in range(3)
    ]
    # even split, full coverage (with wrap-around padding)
    assert all(len(p) == 4 for p in parts)
    assert set(itertools.chain(*parts)) == set(range(12))
    # groups stay contiguous in the concatenated schedule: group id may
    # only change len(groups) times (+1 for the pad wrap)
    seq = [int(flags[i]) for p in parts for i in p]
    changes = sum(a != b for a, b in zip(seq, seq[1:]))
    assert changes <= 4 + 1
    # epoch reshuffle changes the order deterministically
    s = DistributedGroupSampler(flags, num_replicas=1, rank=0, seed=7)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert e0 != e1
    s.set_epoch(0)
    assert list(s) == e0


def test_stream_sampler_slots_play_scenes_in_order():
    lens = [4, 3, 5, 2, 6, 3]
    flags = np.concatenate([[g] * n for g, n in enumerate(lens)])
    ds_order = {g: np.flatnonzero(flags == g).tolist()
                for g in range(len(lens))}
    smp = InfiniteGroupStreamSampler(flags, batch_size=2, seed=1)
    batches = smp.take(20)
    assert all(len(b) == 2 for b in batches)
    for slot in range(2):
        stream = [b[slot] for b in batches]
        # split the slot stream into runs of equal scene
        i = 0
        while i < len(stream):
            g = int(flags[stream[i]])
            run = ds_order[g]
            take = min(len(run), len(stream) - i)
            # scene samples are played IN DATASET ORDER from the start
            assert stream[i:i + take] == run[:take], (slot, i)
            i += take


def test_stream_sampler_global_slots_stride_the_group_sequence():
    lens = [2] * 8  # equal-length scenes: slots stay in lockstep
    flags = np.concatenate([[g] * n for g, n in enumerate(lens)])
    # 2 replicas x batch 2 = 4 global slots
    r0 = InfiniteGroupStreamSampler(flags, batch_size=2, num_replicas=2,
                                    rank=0, seed=3)
    r1 = InfiniteGroupStreamSampler(flags, batch_size=2, num_replicas=2,
                                    rank=1, seed=3)
    b0 = r0.take(2)
    b1 = r1.take(2)
    # with equal scene lengths, the 4 concurrent scenes are distinct
    first = [int(flags[b0[0][0]]), int(flags[b0[0][1]]),
             int(flags[b1[0][0]]), int(flags[b1[0][1]])]
    assert len(set(first)) == 4
    # same seed, same rank -> identical stream
    again = InfiniteGroupStreamSampler(flags, batch_size=2, num_replicas=2,
                                       rank=0, seed=3).take(2)
    assert again == b0


def test_stream_sampler_requires_enough_scenes():
    flags = np.asarray([0, 0, 1, 1])
    with pytest.raises(AssertionError):
        InfiniteGroupStreamSampler(flags, batch_size=4)


def test_prefetch_loader_consumes_batch_schedule():
    """PrefetchLoader with an external batch_schedule must reproduce the
    sampler's batches exactly (including the host local_slice cut)."""
    from rcbevdet_tpu.data.loader import PrefetchLoader

    class _IdxDataset:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"idx": np.asarray([i]), "token": f"t{i}"}

    lens = [3, 3, 3, 3]
    flags = np.concatenate([[g] * n for g, n in enumerate(lens)])
    smp = InfiniteGroupStreamSampler(flags, batch_size=2, seed=0)
    sched = smp.take(6)
    loader = PrefetchLoader(_IdxDataset(), batch_size=2, shuffle=False)
    loader.batch_schedule = sched
    seen = [b["idx"][:, 0].tolist() for b in loader]
    assert seen == sched
    # local_slice takes one slot of every batch
    loader2 = PrefetchLoader(_IdxDataset(), batch_size=2, shuffle=False,
                             local_slice=(1, 1))
    loader2.batch_schedule = sched
    seen2 = [b["idx"][:, 0].tolist() for b in loader2]
    assert seen2 == [[b[1]] for b in sched]
