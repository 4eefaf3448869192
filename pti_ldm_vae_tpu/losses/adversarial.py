"""LSGAN patch-adversarial objectives.

Pure-jnp equivalent of MONAI ``PatchAdversarialLoss(criterion="least_squares")``
as used by the reference (``train_vae.py:298,400-401,449-456``):

* generator loss: MSE(logits_fake, 1)
* discriminator loss: 0.5 * (MSE(logits_fake, 0) + MSE(logits_real, 1)),
  with the 0.5 applied by the caller in the reference (``train_vae.py:455``);
  ``discriminator_loss`` here returns the already-halved sum for convenience.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["lsgan_loss", "generator_loss", "discriminator_loss"]


def lsgan_loss(logits: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """Least-squares GAN objective on patch logits (mean over all elements)."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(jnp.square(logits.astype(jnp.float32) - target))


def generator_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """Generator wants fake -> real target (``train_vae.py:400-401``)."""
    return lsgan_loss(logits_fake, target_is_real=True)


def discriminator_loss(logits_fake: jnp.ndarray, logits_real: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (fake->0 + real->1) (``train_vae.py:452-455``)."""
    return 0.5 * (
        lsgan_loss(logits_fake, target_is_real=False)
        + lsgan_loss(logits_real, target_is_real=True)
    )
