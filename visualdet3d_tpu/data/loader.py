"""Host input pipeline: threaded prefetching loader over indexable datasets.

Replaces torch DataLoader + build_dataloader (reference
visualDet3D/data/dataloader/dataloader_builder.py:6-19). Decoding and
augmentation run in a thread pool (PIL/cv2 release the GIL); batches are
collated into *fixed-shape* numpy arrays (static max_objects pad), so the
jitted device step never re-compiles and there is exactly one host->device
transfer per step.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from concurrent.futures import ThreadPoolExecutor

from visualdet3d_tpu.registry import SAMPLER_DICT
from visualdet3d_tpu.data.samplers import InferenceSampler, TrainingSampler


class DataLoader:
    """Batched loader with background prefetch.

    Args:
      dataset: indexable with __getitem__/__len__.
      batch_size: items per batch.
      collate_fn: fn(list_of_items) -> batch.
      sampler: iterable of indices; default sequential one-pass.
      num_workers: decode threads (0 = synchronous).
      prefetch: number of batches to stage ahead.
      drop_last: drop the trailing partial batch (True keeps shapes static).
    """

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 sampler: Optional[Iterable[int]] = None, num_workers: int = 4,
                 prefetch: int = 2, drop_last: bool = True,
                 infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.infinite = infinite

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> Iterator[list]:
        indices = self.sampler if self.sampler is not None else range(len(self.dataset))
        batch = []
        for idx in indices:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self):
        if self.num_workers <= 0:
            for idx_batch in self._index_batches():
                yield self.collate_fn([self.dataset[i] for i in idx_batch])
            return
        yield from self._threaded_iter()

    def _threaded_iter(self):
        out_q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for idx_batch in self._index_batches():
                        items = list(pool.map(self.dataset.__getitem__, idx_batch))
                        out_q.put(self.collate_fn(items))
                except BaseException as e:  # surface worker errors to consumer
                    out_q.put(e)
                    return
                out_q.put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataloader(dataset, num_workers: int, batch_size: int,
                     collate_fn: Callable, local_rank: int = -1,
                     world_size: int = 1, sampler_cfg=None,
                     training: bool = True) -> DataLoader:
    """Registry-driven builder, mirroring the reference API
    (dataloader_builder.py:6-19)."""
    rank = max(local_rank, 0)
    if sampler_cfg is not None:
        sampler = SAMPLER_DICT.build(sampler_cfg, size=len(dataset),
                                     rank=rank, world_size=world_size)
    elif training:
        sampler = TrainingSampler(len(dataset), shuffle=True,
                                  rank=rank, world_size=world_size)
    else:
        sampler = InferenceSampler(len(dataset), rank=rank, world_size=world_size)
    return DataLoader(dataset, batch_size=batch_size, collate_fn=collate_fn,
                      sampler=sampler, num_workers=num_workers,
                      drop_last=training, infinite=training)
