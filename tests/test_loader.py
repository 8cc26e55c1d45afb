import numpy as np

from visualdet3d_tpu.data.loader import DataLoader, build_dataloader
from visualdet3d_tpu.data.samplers import InferenceSampler, TrainingSampler


class SquareDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'x': np.full((2, 2), i, np.float32), 'idx': i}


def collate(items):
    return {'x': np.stack([it['x'] for it in items]),
            'idx': [it['idx'] for it in items]}


def test_training_sampler_shards_and_covers():
    s0 = list(__import__('itertools').islice(
        iter(TrainingSampler(10, shuffle=False, rank=0, world_size=2)), 5))
    s1 = list(__import__('itertools').islice(
        iter(TrainingSampler(10, shuffle=False, rank=1, world_size=2)), 5))
    assert sorted(s0 + s1) == list(range(10))
    assert set(s0).isdisjoint(s1)


def test_training_sampler_infinite_and_shuffled():
    import itertools
    idx = list(itertools.islice(iter(TrainingSampler(8, seed=1)), 24))
    assert len(idx) == 24
    assert sorted(idx[:8]) == list(range(8))  # full permutation per pass
    assert idx[:8] != list(range(8)) or idx[8:16] != list(range(8))


def test_inference_sampler_partition():
    parts = [list(InferenceSampler(11, rank=r, world_size=3)) for r in range(3)]
    flat = sum(parts, [])
    assert sorted(flat) == list(range(11))


def test_loader_threaded_matches_sync():
    ds = SquareDataset(13)
    sync = DataLoader(ds, batch_size=4, collate_fn=collate, num_workers=0,
                      drop_last=False)
    threaded = DataLoader(ds, batch_size=4, collate_fn=collate, num_workers=3,
                          drop_last=False)
    b_sync = list(sync)
    b_thr = list(threaded)
    assert len(b_sync) == len(b_thr) == 4
    for a, b in zip(b_sync, b_thr):
        np.testing.assert_array_equal(a['x'], b['x'])
    assert b_sync[-1]['x'].shape[0] == 1  # remainder kept when drop_last=False


def test_loader_drop_last():
    ds = SquareDataset(13)
    loader = DataLoader(ds, batch_size=4, collate_fn=collate, num_workers=2,
                        drop_last=True, sampler=range(13))
    batches = list(loader)
    assert len(batches) == 3
    assert all(b['x'].shape[0] == 4 for b in batches)


def test_loader_worker_errors_propagate():
    class Bad(SquareDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError('boom')
            return super().__getitem__(i)

    loader = DataLoader(Bad(8), batch_size=4, collate_fn=collate, num_workers=2,
                        drop_last=False)
    import pytest
    with pytest.raises(RuntimeError, match='boom'):
        list(loader)


def test_build_dataloader_registry_path():
    ds = SquareDataset(10)
    loader = build_dataloader(ds, num_workers=0, batch_size=2,
                              collate_fn=collate, training=False)
    batches = list(loader)
    assert len(batches) == 5
