"""Reconstruction losses and total-loss composition.

Parity with reference ``compute_total_loss`` (``models/losses.py:33-66``) and
the L1/L2 choice (``train_vae.py:289-296``). Pure jnp; weights are Python
floats baked in at trace time (they come from config, never change mid-run).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1_loss", "l2_loss", "reconstruction_loss", "compute_total_loss"]


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def reconstruction_loss(pred: jnp.ndarray, target: jnp.ndarray, kind: str = "l1") -> jnp.ndarray:
    """``recon_loss`` config knob: 'l1' (default) or 'l2' (``train_vae.py:289-296``)."""
    if kind == "l2":
        return l2_loss(pred, target)
    return l1_loss(pred, target)


def compute_total_loss(
    recons_loss,
    kl_loss,
    perceptual_loss,
    adv_gen_loss,
    ar_loss,
    *,
    kl_weight: float,
    perceptual_weight: float,
    adv_weight: float,
    ar_gamma: float,
    ar_vae_enabled: bool,
):
    """total = recon + kl_w*kl + p_w*perc + adv_w*adv [+ gamma*ar]
    (reference ``losses.py:63-66``)."""
    total = (
        recons_loss
        + kl_weight * kl_loss
        + perceptual_weight * perceptual_loss
        + adv_weight * adv_gen_loss
    )
    if ar_vae_enabled:
        total = total + ar_gamma * ar_loss
    return total
