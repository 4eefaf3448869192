"""Device mesh + sharding helpers — the DDP/NCCL equivalent (SURVEY.md §5.8).

The reference's distributed stack is one strategy: data parallelism via
``torch.distributed`` + NCCL + ``DistributedSampler`` (``distributed.py``,
``train_vae.py:277-304``). The TPU-native mapping:

* one JAX process per host; devices form a ``jax.sharding.Mesh`` with a
  ``data`` axis (ICI within a slice, DCN across slices),
* DDP gradient all-reduce  ==  XLA-inserted ``psum`` when the batch is
  sharded on ``data`` and params are replicated under ``jit``,
* ``DistributedSampler``    ==  per-host index sharding
  (``data.loader.shard_indices`` keyed by ``jax.process_index()``),
* SyncBatchNorm             ==  not needed (the discriminator uses instance
  norm, which has no cross-replica statistics),
* ``dist.barrier()``        ==  a blocking collective at startup
  (:func:`barrier_sync`).

A ``model`` axis is reserved for future tensor/spatial sharding of the conv
stacks (image-resolution scaling, SURVEY.md §5.7 — additive, not parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "barrier_sync",
    "world_size",
    "process_rank",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, *, data: int | None = None, model: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ``(data, model)`` axes.

    ``data`` defaults to ``len(devices) // model``.
    """
    devices = jax.devices() if devices is None else list(devices)
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(f"{len(devices)} devices cannot form ({data}, {model}) mesh")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) with batch-axis sharding."""

    def place(x):
        x = jnp.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(place, batch)


def barrier_sync() -> None:
    """Blocking cross-device collective (reference ``dist.barrier()``,
    ``distributed.py:27``)."""
    x = jnp.ones((jax.device_count(),))
    jax.block_until_ready(
        jax.jit(lambda v: jnp.sum(v), out_shardings=None)(x)
    )


def world_size() -> int:
    return jax.device_count()


def process_rank() -> int:
    return jax.process_index()
