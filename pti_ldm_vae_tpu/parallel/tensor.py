"""Tensor parallelism: channel sharding over the mesh ``model`` axis.

The reference's only strategy is data parallelism (SURVEY.md §2.3); like
spatial partitioning (``parallel/spatial.py``) this is a TPU-native scaling
extension. The idiomatic JAX mechanism is the same as spatial's: annotate
the INPUTS (here, the parameters) and let GSPMD propagate — no hand-written
collectives:

* every parameter whose trailing (output-channel / feature) axis divides
  the ``model`` axis is placed with ``P(..., "model")`` — conv kernels
  (HWIO: O sharded), Dense kernels ([in, out]: out sharded), biases and
  norm scales ([C]: C sharded),
* under ``jit`` the activations propagate to ``[B, H, W, C/model]``,
  group-norm statistics get their cross-shard ``psum`` inserted
  automatically, and channel-contracting convolutions reduce-scatter /
  all-gather over ICI exactly where dataflow needs them,
* gradients and Adam state inherit the same layout (``zeros_like``
  preserves sharding), so optimizer state is sharded too — the ZeRO-ish
  memory split falls out for free.

The flagship VAE (18 MB of params) does not NEED tensor parallelism; the
axis exists for channel counts that outgrow one chip and is numerics-pinned
against the replicated program on the CPU mesh
(``tests/test_tensor_parallel.py``), the same standard spatial sharding
meets. Config: ``"parallelism": {"tensor": N}`` (mutually exclusive with
``spatial`` — both ride the ``model`` axis).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["tensor_parallel_params"]


def tensor_parallel_params(mesh: Mesh, params, *, min_features: int = 8):
    """Place a parameter tree with trailing-axis (channel) sharding.

    Leaves whose last dimension is divisible by the ``model`` axis size and
    at least ``min_features`` wide shard that axis; everything else (scalars,
    tiny latent-channel convs) replicates. Mixed layouts are fine — GSPMD
    reshards at use sites.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def place(x):
        shardable = (
            model_size > 1
            and getattr(x, "ndim", 0) >= 1
            and x.shape[-1] >= max(min_features, model_size)
            and x.shape[-1] % model_size == 0
        )
        spec = (
            P(*([None] * (x.ndim - 1)), MODEL_AXIS) if shardable else P()
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
