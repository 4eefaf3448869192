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
* ``dist.barrier()``        ==  :func:`barrier_sync` — a real cross-process
  collective (``multihost_utils.sync_global_devices``) under multi-host.

Multi-host batch assembly: each process feeds its LOCAL loader shard to
:func:`place_batch`, which pads it to the per-process device count (masked
rows, numerically inert — every loss is a masked mean) and assembles a
global array via ``jax.make_array_from_process_local_data``. Under one
process this degrades to a plain sharded ``device_put``. The ``model`` axis
carries spatial (image-height) sharding — see ``parallel/spatial.py``.
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
    "pad_batch",
    "place_batch",
    "shard_batch",
    "first_local_rows",
    "first_row_refs",
    "first_row_read",
    "barrier_sync",
    "world_size",
    "process_rank",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, *, data: int | None = None, model: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ``(data, model)`` axes.

    ``data`` defaults to ``len(devices) // model``. Under multi-host, pass
    the GLOBAL device list (the default) — jit programs address every device
    even though each process only feeds its local ones.
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


def pad_batch(batch, multiple: int):
    """Zero-pad every array's leading axis to the next multiple.

    Padding rows carry ``mask == 0`` (they are zeros), so masked-mean losses
    and metrics ignore them — numerically identical to the unpadded batch.
    """
    leaves = jax.tree.leaves(batch)
    if not leaves or multiple <= 1:
        return batch
    n = np.asarray(leaves[0]).shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return batch

    def pad(x):
        x = np.asarray(x)
        if x.ndim == 0:  # scalar leaves have no batch axis; replicate as-is
            return x
        width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, width)

    return jax.tree.map(pad, batch)


def place_batch(mesh: Mesh, batch, *, spatial: bool = False):
    """Place a process-local host batch as a GLOBAL batch-sharded array tree.

    * single process: sharded ``device_put`` (row i -> data-axis shard i),
    * multi-host: ``jax.make_array_from_process_local_data`` assembles the
      global array from each process's local rows (the loader already shards
      files by ``process_index``; global batch = sum of local batches).

    Local batches are padded (masked) to the per-process slice of the data
    axis so every shard is equal-sized — XLA requires even sharding.
    With ``spatial=True``, 4-D (NHWC) arrays additionally shard H over the
    ``model`` axis (``parallel/spatial.py``).
    """
    n_proc = jax.process_count()
    data_size = mesh.shape[DATA_AXIS]
    if data_size % n_proc:
        raise ValueError(
            f"data axis ({data_size}) must divide evenly over {n_proc} processes"
        )
    batch = pad_batch(batch, data_size // n_proc)

    def spec_for(x) -> P:
        if x.ndim == 0:  # scalar leaf: replicated, no batch axis to shard
            return P()
        if spatial and x.ndim == 4:
            return P(DATA_AXIS, MODEL_AXIS, None, None)
        return P(DATA_AXIS, *([None] * (x.ndim - 1)))

    def place(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec_for(x))
        if n_proc == 1:
            return jax.device_put(jnp.asarray(x), sharding)
        global_shape = (
            () if x.ndim == 0 else (x.shape[0] * n_proc, *x.shape[1:])
        )
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(place, batch)


def shard_batch(mesh: Mesh, batch):
    """Back-compat alias: batch-axis sharding without spatial partitioning."""
    return place_batch(mesh, batch, spatial=False)


def first_local_rows(x) -> np.ndarray:
    """Host copy of the rows resident on this process's first device.

    Safe under multi-host where ``np.asarray(global_array)`` would raise on
    non-addressable shards; used for image dumps/debug, never for metrics.
    Under spatial sharding each shard is a (batch, height) TILE, so the
    addressable shards sharing the first shard's batch range are stitched
    back together along the height axis — otherwise dumps would be
    vertically-cropped fragments. Falls back to the bare first shard if this
    process doesn't hold every height tile of its rows (model axis split
    across processes).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    shards = x.addressable_shards
    first = shards[0]
    if x.ndim < 2:
        return np.asarray(first.data)
    tiles = _first_shard_tiles(shards)
    stitched = np.concatenate([np.asarray(s.data) for s in tiles], axis=1)
    if stitched.shape[1] != x.shape[1]:  # incomplete height coverage
        return np.asarray(first.data)
    return stitched


def _first_shard_tiles(shards):
    """The addressable shards sharing the first shard's batch range, sorted
    by height-tile start and deduplicated across replicas."""
    batch_key = shards[0].index[0]
    tiles = sorted(
        (s for s in shards if s.index[0] == batch_key),
        key=lambda s: (s.index[1].start or 0) if isinstance(s.index[1], slice) else 0,
    )
    # dedup replicated tiles (same H-range on several devices)
    seen, unique = set(), []
    for s in tiles:
        h_key = (s.index[1].start, s.index[1].stop) if isinstance(s.index[1], slice) else None
        if h_key in seen:
            continue
        seen.add(h_key)
        unique.append(s)
    return unique


def first_row_refs(x):
    """Non-blocking handle on this process's FIRST local sample of ``x``.

    Phase 1 of the deferred dump path: dispatches tiny device-side slices
    (row 0 only) and holds just those buffers — no host copy, no pin on the
    full batch — so a train/eval dispatch loop can bank dump rows without
    serializing on a device→host transfer (``np.asarray`` blocks until the
    producing computation finishes). ``first_row_read`` is phase 2.
    """
    if jax.process_count() == 1:
        return ("single", jnp.asarray(x)[:1], None, None)
    shards = x.addressable_shards
    if x.ndim < 2:
        return ("flat", shards[0].data, None, None)
    tiles = _first_shard_tiles(shards)
    return ("tiles", [s.data[:1] for s in tiles], shards[0].data[:1], x.shape[1])


def first_row_read(ref) -> np.ndarray:
    """Host copy of a ``first_row_refs`` handle: ``[1, ...]`` numpy array,
    spatial height tiles stitched exactly like ``first_local_rows``."""
    kind, data, fallback, height = ref
    if kind in ("single", "flat"):
        return np.asarray(data)
    stitched = np.concatenate([np.asarray(d) for d in data], axis=1)
    if stitched.shape[1] != height:  # incomplete height coverage
        return np.asarray(fallback)
    return stitched


def barrier_sync(tag: str = "barrier") -> None:
    """Cross-PROCESS barrier (reference ``dist.barrier()``,
    ``distributed.py:27``). A real collective under multi-host; a device
    flush under a single process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
    else:
        jax.block_until_ready(jnp.zeros(()))


def world_size() -> int:
    """DDP ``world_size`` analog for LR scaling: the number of PROCESSES.

    The reference scales LR by its process count because each DDP rank adds
    ``batch_size`` samples to the global batch (``train_vae.py:301-304``).
    Here a single host drives all its chips over one ``batch_size`` batch, so
    chips alone don't grow the global batch — processes do.
    """
    return jax.process_count()


def process_rank() -> int:
    return jax.process_index()
