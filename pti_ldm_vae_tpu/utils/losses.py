"""Utility helpers for loss computations (reference
``src/pti_ldm_vae/utils/losses.py`` — same module location, NHWC semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ensure_three_channels"]


def ensure_three_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Return an NHWC batch with three channels for ImageNet backbones.

    Single-channel inputs are repeated channel-wise (reference
    ``utils/losses.py:8-28`` does the same on NCHW); 3-channel inputs pass
    through; anything else is an error.
    """
    if x.ndim != 4:
        raise ValueError(f"Expected 4D NHWC tensor, got shape {x.shape}")
    channels = x.shape[-1]
    if channels == 3:
        return x
    if channels == 1:
        return jnp.repeat(x, 3, axis=-1)
    raise ValueError(f"expected 1 or 3 channels, got {channels}")
