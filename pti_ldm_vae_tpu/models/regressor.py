"""Latent regression head + frozen-VAE wrapper (NHWC, Flax).

Equivalent of reference ``src/pti_ldm_vae/models/regression_head.py``:

* ``LatentRegressor`` — configurable MLP ``[in, *hidden, out]`` with
  activation in {relu, gelu, leaky_relu, elu} and optional dropout
  (``regression_head.py:30-78``),
* ``VAELatentRegressor`` — frozen VAE deterministic encode -> flatten ->
  MLP (``regression_head.py:81-138``). Freezing is structural here: the VAE
  params simply aren't in the trainable pytree, and the encode is wrapped in
  ``stop_gradient`` — no ``requires_grad`` bookkeeping,
* ``infer_flat_dim_from_patch`` via ``jax.eval_shape`` — shape inference
  without burning a dummy forward on device (``regression_head.py:145-169``
  runs a real one).

Latents are flattened in **channel-major (NCHW) order** to remain
weight-compatible with reference head checkpoints.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .autoencoder_kl import AutoencoderKL

__all__ = ["LatentRegressor", "VAELatentRegressor", "flatten_latent", "infer_flat_dim_from_patch"]

_ACTIVATIONS = {
    "relu": nn.relu,
    # exact erf GELU: torch nn.GELU default (jax's default is the tanh approx)
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.01),
    "elu": nn.elu,
}


def flatten_latent(latent_nhwc: jnp.ndarray) -> jnp.ndarray:
    """Channel-last latent [B, *spatial, C] -> [B, C*prod(spatial)] in torch
    channel-major flatten order (parity with
    ``torch.flatten(latent, start_dim=1)``, ``regression_head.py:131``;
    rank-generic so 3-D NDHWC latents flatten in NCDHW order)."""
    if latent_nhwc.ndim > 2:
        axes = (0, latent_nhwc.ndim - 1, *range(1, latent_nhwc.ndim - 1))
        latent_nhwc = jnp.transpose(latent_nhwc, axes)
    return latent_nhwc.reshape(latent_nhwc.shape[0], -1)


class LatentRegressor(nn.Module):
    hidden_dims: Sequence[int] = ()
    output_dim: int = 1
    dropout: float = 0.0
    activation: str = "relu"
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent_flat: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.activation not in _ACTIVATIONS:
            raise ValueError(
                f"Unsupported activation: {self.activation}. "
                f"Choose from {', '.join(_ACTIVATIONS)}."
            )
        if self.output_dim <= 0:
            raise ValueError("output_dim must be positive.")
        act = _ACTIVATIONS[self.activation]
        h = latent_flat
        for idx, width in enumerate(self.hidden_dims):
            h = nn.Dense(width, param_dtype=self.param_dtype, name=f"dense_{idx}")(h)
            h = act(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.output_dim, param_dtype=self.param_dtype, name="dense_out")(h)


class VAELatentRegressor:
    """Functional wrapper: frozen VAE encoder + trainable MLP head.

    Unlike the torch original this is not an nn.Module — the VAE variables
    are captured as frozen constants and only the head params are exposed
    for optimization (the cleanest JAX expression of "requires_grad=False").
    """

    FLATTEN_WARNING_THRESHOLD = 131072  # reference ``regression_head.py:90``

    def __init__(
        self,
        vae: AutoencoderKL,
        vae_variables: Any,
        regressor: LatentRegressor,
        *,
        latent_dim: int,
    ):
        self.vae = vae
        self.vae_variables = vae_variables
        self.regressor = regressor
        self.latent_dim = latent_dim
        if latent_dim > self.FLATTEN_WARNING_THRESHOLD:
            import warnings

            warnings.warn(
                f"Flattened latent dimension {latent_dim} is large; consider "
                "reducing patch size or latent channels.",
                stacklevel=2,
            )

    def init_head(self, rng: jax.Array) -> Any:
        return self.regressor.init(rng, jnp.zeros((1, self.latent_dim), jnp.float32))

    def encode_flat(self, images: jnp.ndarray) -> jnp.ndarray:
        """Frozen deterministic encode + flatten (no gradient into the VAE)."""
        latent = self.vae.apply(
            self.vae_variables, images, method=self.vae.encode_deterministic
        )
        return jax.lax.stop_gradient(flatten_latent(latent))

    def apply(self, head_params: Any, images: jnp.ndarray, *, rngs=None) -> jnp.ndarray:
        flat = self.encode_flat(images)
        deterministic = rngs is None
        return self.regressor.apply(
            head_params, flat, deterministic=deterministic,
            rngs=rngs if rngs else None,
        )


def infer_flat_dim_from_patch(
    vae: AutoencoderKL, vae_variables: Any, patch_size, *, channels: int | None = None
) -> int:
    """Flattened latent size for a patch, via abstract evaluation (zero FLOPs).

    ``patch_size`` may have any spatial rank matching the VAE's
    ``spatial_dims`` (e.g. ``(D, H, W)`` for a 3-D model)."""
    spatial = tuple(patch_size)
    in_ch = channels if channels is not None else vae.in_channels
    latent = jax.eval_shape(
        lambda v, x: vae.apply(v, x, method=vae.encode_deterministic),
        vae_variables,
        jax.ShapeDtypeStruct((1, *spatial, in_ch), jnp.float32),
    )
    size = 1
    for dim in latent.shape[1:]:
        size *= dim
    return int(size)
