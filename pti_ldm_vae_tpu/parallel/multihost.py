"""Multi-host initialization — the torchrun/env:// rendezvous equivalent.

The reference spawns one process per GPU via torchrun and rendezvous through
``dist.init_process_group("nccl", init_method="env://")``
(``distributed.py:20-26``). Under JAX the analog is one process per HOST with
``jax.distributed.initialize``; all per-host devices are driven by that one
process, and collectives ride ICI within a slice / DCN across slices.

On TPU pods the coordinator/process-count/process-id are discovered from the
runtime automatically; for CPU/GPU fleets set ``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID``. Single-process runs (the
default everywhere in this repo's tests/bench) skip initialization entirely.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize_distributed"]

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime when the environment asks for it.

    Trigger conditions: ``JAX_COORDINATOR_ADDRESS`` set (explicit fleet), or
    running on a multi-host TPU slice (auto-discovered). Returns True when
    multi-process mode is active. Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _initialized = True
        return True

    # TPU pod slices: the runtime knows the topology; initialize() with no
    # arguments discovers everything. Only attempt when the TPU runtime
    # reports multiple hosts (single-host slices need no init).
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
        jax.distributed.initialize()
        _initialized = True
        return True

    _initialized = True
    return False
