"""Determinism: seed host RNGs + derive the JAX PRNG key.

Reference uses MONAI ``set_determinism(seed)`` (``train_vae.py:808``,
``cli_common.py:53``) to seed python/numpy/torch. The JAX equivalent: seed
python/numpy for host-side decisions (data split/shuffle) and thread an
explicit ``jax.random.key(seed)`` through all device-side randomness — jit
programs are then bit-deterministic by construction.
"""

from __future__ import annotations

import random

import jax
import numpy as np

__all__ = ["set_determinism"]


def set_determinism(seed: int | None = 42) -> jax.Array:
    """Seed host RNGs; returns the root JAX PRNG key."""
    if seed is None:
        seed = 0
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)
