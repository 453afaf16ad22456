"""Device-mesh helpers — the TPU-native replacement for the reference's
NCCL/DDP distributed layer (reference train.py:25, trainer.py:28-30).

Design: one process per host drives all local chips; `jax.distributed`
handles multi-host. The only parallelism the workload needs is data
parallelism (the model is ~60M params), so the default mesh is 1-D ('data',)
— gradients all-reduce over ICI inside the jitted train step, and metrics
reduce for free because outputs are replicated. A second axis name ('model')
is reserved for future tensor sharding of the memory bank (ring readout over
ICI for giant long-term stores).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',)) -> Mesh:
    """1-D data mesh over the first n local devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def memory_mesh(n_shards: int) -> Mesh:
    """1-D mesh over the first n_shards local devices, axis 'memory' — the
    memory-bank sharding axis (MemoryManager memory_shards mode). Distinct
    axis name from training's 'data' so the two can coexist in one program."""
    devices = jax.devices()
    if len(devices) < n_shards:
        raise ValueError(
            f'memory_shards={n_shards} but only {len(devices)} devices '
            f'are visible')
    return Mesh(np.asarray(devices[:n_shards]), ('memory',))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch dim sharded over 'data'
    (the DistributedSampler + .cuda() pair of the reference)."""
    ds = data_sharding(mesh)
    return {k: (jax.device_put(v, ds) if hasattr(v, 'shape') else v)
            for k, v in batch.items()}
