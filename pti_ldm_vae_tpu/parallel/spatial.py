"""Spatial sharding: image-resolution scaling beyond one chip.

The reference has no parallelism beyond data parallel (SURVEY.md §2.3); its
analogous scaling axis is image resolution (§5.7). The TPU-native answer is
2-D spatial partitioning: shard the image HEIGHT dimension over the mesh
``model`` axis and let XLA's spatial partitioner insert the halo exchanges
that 3x3 convs/downsamples need (collective-permutes over ICI). Verified
numerically identical to the unsharded program (see
``tests/test_spatial_sharding.py``).

Combine with batch sharding on the ``data`` axis for dp x sp meshes:

    mesh = make_mesh(devices, data=4, model=2)
    x = shard_batch_spatial(mesh, images)   # P("data", "model", None, None)
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, place_batch

__all__ = ["spatial_sharding", "shard_batch_spatial"]


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch on ``data``, height on ``model`` (NHWC)."""
    if ndim != 4:
        raise ValueError("spatial sharding targets NHWC image batches")
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))


def shard_batch_spatial(mesh: Mesh, batch):
    """Place image arrays with (data, model) sharding; 1-D arrays (masks)
    shard on data only. Multi-host-safe (``mesh.place_batch``)."""
    return place_batch(mesh, batch, spatial=True)
