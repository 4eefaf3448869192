"""KL divergence of the diagonal-Gaussian posterior.

Mirrors reference ``src/pti_ldm_vae/models/losses.py:4-30`` exactly,
including its documented numerics quirk (SURVEY.md §2.4.1): MONAI's
``AutoencoderKL.forward`` returns ``(recon, z_mu, z_sigma)`` — a *standard
deviation* — but the reference feeds it to ``compute_kl_loss`` as if it were a
log-variance. The trained objective is therefore
``-0.5 * sum(1 + sigma - mu^2 - exp(sigma))``: mislabeled but well-defined.

``kl_from_forward(..., mode="reference")`` reproduces that objective for
parity; ``mode="corrected"`` computes the mathematically standard KL from
sigma. Both are jit-safe pure functions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_kl_loss", "kl_from_forward"]


def compute_kl_loss(
    z_mu: jnp.ndarray,
    z_logvar: jnp.ndarray,
    *,
    input_is_logvar: bool = True,
) -> jnp.ndarray:
    """KL(N(mu, var) || N(0, 1)), summed over non-batch dims, batch-meaned.

    Same contract as the reference function (``losses.py:4-30``): when
    ``input_is_logvar=False`` the second argument is a standard deviation and
    is converted via ``log(sigma^2 + 1e-8)``.
    """
    z_mu = z_mu.astype(jnp.float32)
    z_logvar = z_logvar.astype(jnp.float32)
    if not input_is_logvar:
        z_logvar = jnp.log(jnp.square(z_logvar) + 1e-8)
    axes = tuple(range(1, z_logvar.ndim))
    kl = -0.5 * jnp.sum(1.0 + z_logvar - jnp.square(z_mu) - jnp.exp(z_logvar), axis=axes)
    return jnp.mean(kl)


def kl_from_forward(
    z_mu: jnp.ndarray, z_sigma: jnp.ndarray, *, mode: str = "reference"
) -> jnp.ndarray:
    """KL term from the model's ``(z_mu, z_sigma)`` outputs.

    ``mode="reference"``: byte-for-byte the reference training objective —
    sigma is (mis)used as a log-variance (``train_vae.py:385,394``).
    ``mode="corrected"``: the standard KL with sigma treated as sigma.
    """
    if mode == "reference":
        return compute_kl_loss(z_mu, z_sigma, input_is_logvar=True)
    if mode == "corrected":
        return compute_kl_loss(z_mu, z_sigma, input_is_logvar=False)
    raise ValueError(f"kl mode must be 'reference' or 'corrected', got {mode!r}")
