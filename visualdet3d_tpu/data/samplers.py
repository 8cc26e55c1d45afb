"""Index samplers.

TrainingSampler reproduces the reference's detectron2-style infinite stream
sharded by rank (visualDet3D/data/dataloader/distributed_sampler.py:8-60);
InferenceSampler is the deterministic sharded range.
"""
from __future__ import annotations

import itertools
from typing import Iterator, Optional

import numpy as np

from visualdet3d_tpu.registry import SAMPLER_DICT


@SAMPLER_DICT.register_module
class TrainingSampler:
    """Infinite (shuffled) index stream, sharded rank::world_size."""

    def __init__(self, size: int, shuffle: bool = True,
                 seed: Optional[int] = None, rank: int = 0, world_size: int = 1):
        assert size > 0
        self.size = size
        self.shuffle = shuffle
        self.seed = 0 if seed is None else int(seed)
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(
            self._infinite_indices(), self.rank, None, self.world_size)

    def _infinite_indices(self):
        rng = np.random.default_rng(self.seed)
        while True:
            if self.shuffle:
                yield from rng.permutation(self.size).tolist()
            else:
                yield from range(self.size)


@SAMPLER_DICT.register_module
class InferenceSampler:
    """One deterministic pass, contiguous shards per rank."""

    def __init__(self, size: int, rank: int = 0, world_size: int = 1):
        self.size = size
        shard = (size + world_size - 1) // world_size
        self.begin = min(rank * shard, size)
        self.end = min(self.begin + shard, size)

    def __iter__(self):
        return iter(range(self.begin, self.end))

    def __len__(self):
        return self.end - self.begin
