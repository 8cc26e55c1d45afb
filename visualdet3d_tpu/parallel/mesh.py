"""Device mesh + sharding helpers: the TPU-native "distributed backend".

The reference's only parallelism is single-node DDP over NCCL
(scripts/train.py:65-98: init_process_group('nccl'), DistributedDataParallel,
SyncBatchNorm, per-rank sharded sampler, rank-0 logging, epoch barriers).
Here the same data parallelism is expressed the XLA way (SURVEY.md §2.9):

* one global jitted train step over a 1-D ``data`` mesh;
* batches sharded over the mesh with NamedSharding(P('data'));
* parameters/optimizer state replicated (P());
* gradient all-reduce and BatchNorm cross-replica statistics come out of
  GSPMD automatically — a batch mean under jit *is* the global mean, lowered
  to ICI collectives; this is exact SyncBatchNorm, no wrapper needed;
* multi-host: call :func:`initialize_distributed` (jax.distributed) before
  device_count() and the same code runs over DCN-connected hosts.

A ``model`` axis is reserved in :func:`make_mesh` for tensor-parallel
shardings; the reference's models (<50M params) do not need it (SURVEY §2.9),
so the default mesh is (data=N, model=1).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN): the analogue of init_process_group
    (reference scripts/train.py:71), handled by the JAX runtime."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices: Optional[Sequence] = None,
              data_axis: str = 'data',
              model_axis: str = 'model',
              model_parallelism: int = 1) -> Mesh:
    """1-D (or 2-D when model_parallelism > 1) device mesh."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = devices.reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (data_axis, model_axis))


def data_sharding(mesh: Mesh, data_axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = 'data'):
    """device_put every leaf with its batch dim sharded over the mesh.

    Leaves without a shardable leading dim (scalars like the rampup epoch,
    or ragged extras) are replicated instead.
    """
    n = mesh.shape[data_axis]
    batched = data_sharding(mesh, data_axis)
    scalar = replicated(mesh)

    def put(x):
        x = np.asarray(x) if not hasattr(x, 'ndim') else x
        if getattr(x, 'ndim', 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, batched)
        return jax.device_put(x, scalar)
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """device_put every leaf fully replicated."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def num_local_batch(global_batch: int, mesh: Mesh, data_axis: str = 'data') -> int:
    return global_batch // mesh.shape[data_axis]
