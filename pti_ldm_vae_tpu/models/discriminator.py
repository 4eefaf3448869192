"""PatchGAN discriminator (channel-last, Flax; spatial_dims 1/2/3).

Equivalent of MONAI ``PatchDiscriminator(num_layers_d=3, channels=32,
in_channels=1, out_channels=1, norm="INSTANCE")`` as constructed by the
reference (``vae_scripts/train_vae.py:268-275``): a pix2pix-style 70x70
PatchGAN — 4x4 convs, LeakyReLU(0.2), InstanceNorm, channel doubling per
level. ``__call__`` returns the list of per-layer feature maps; training
consumes only the final logits map ``[-1]`` (``train_vae.py:400,451-453``).

The reference wraps this in SyncBatchNorm conversion for DDP
(``train_vae.py:278``) — a no-op for instance norm (param-free,
track_running_stats=False), so the TPU build needs no cross-replica
statistics here.

Layer stack, key names, and init verified against MONAI 1.5.1
``patchgan_discriminator.py`` — see ``docs/MONAI_NOTES.md`` §3. Conv kernels
use the pix2pix ``normal(0, 0.02)`` init like MONAI's ``initialise_weights``.
Real reference discriminator checkpoints load via
``checkpoint/torch_convert.py::disc_from_torch_state_dict``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norm import instance_norm

__all__ = ["PatchDiscriminator"]


class PatchDiscriminator(nn.Module):
    spatial_dims: int = 2
    num_layers_d: int = 3
    channels: int = 32
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 4
    negative_slope: float = 0.2
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        if self.spatial_dims not in (1, 2, 3):
            raise ValueError(f"spatial_dims must be 1, 2, or 3, got {self.spatial_dims}")
        sd = self.spatial_dims
        conv_kw = dict(
            kernel_size=(self.kernel_size,) * sd,
            padding=1,
            kernel_init=nn.initializers.normal(0.02),
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
        )
        features: list[jnp.ndarray] = []
        h = x.astype(self.compute_dtype)

        # Initial: conv + LeakyReLU (no norm — pix2pix convention).
        h = nn.Conv(self.channels, strides=(2,) * sd, name="conv_0", **conv_kw)(h)
        h = nn.leaky_relu(h, self.negative_slope)
        features.append(h)

        ch = self.channels
        for layer in range(1, self.num_layers_d):
            ch *= 2
            h = nn.Conv(ch, strides=(2,) * sd, use_bias=False, name=f"conv_{layer}", **conv_kw)(h)
            h = instance_norm(h)
            h = nn.leaky_relu(h, self.negative_slope)
            features.append(h)

        # Penultimate: stride-1 conv + norm + act.
        ch *= 2
        h = nn.Conv(ch, strides=(1,) * sd, use_bias=False, name="conv_penultimate", **conv_kw)(h)
        h = instance_norm(h)
        h = nn.leaky_relu(h, self.negative_slope)
        features.append(h)

        # Final logits map.
        h = nn.Conv(self.out_channels, strides=(1,) * sd, name="conv_final", **conv_kw)(h)
        features.append(h.astype(jnp.float32))
        return features
