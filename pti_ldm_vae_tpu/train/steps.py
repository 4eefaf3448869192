"""Jitted train / eval / inference steps for the VAE-GAN workload.

Functional re-design of the reference's eager per-batch loop
(``train_vae.py:342-495``): one pure function computes the generator update
(forward, all loss terms, backward, Adam) and — when the adversarial branch is
active — the discriminator update on detached reconstructions, exactly like
the reference's two-optimizer schedule (G step ``:384-445``, D step
``:448-458``).

TPU-first details:

* the whole step is one XLA program: forward+backward+both optimizer updates
  fuse, and under a data-sharded batch XLA inserts the gradient all-reduce
  (the DDP equivalent) automatically,
* the GAN warm-up gate (``epoch > 5``, ``train_vae.py:399,449``) is a
  *static* Python bool — flipping it retraces once, instead of dragging a
  dead discriminator subgraph through the first six epochs,
* batches are zero-padded to static shapes; every loss term is a masked mean
  so padding never leaks into gradients (reference ships ragged last batches
  instead — an XLA retrace per epoch),
* losses accumulate in f32 while the conv stack runs in the model's
  ``compute_dtype`` (bf16 on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..losses.ar_vae import ARVaeSpec, compute_ar_vae_loss
from ..losses.composite import compute_total_loss
from ..models.lpips import lpips_distance_per_sample, lpips_distance_per_sample_3d
from .state import GanTrainState

__all__ = ["LossConfig", "make_train_step", "make_eval_step", "make_inference_fn"]


@dataclass(frozen=True)
class LossConfig:
    """Static loss hyperparameters (from ``autoencoder_train`` config block)."""

    recon_loss: str = "l1"
    kl_weight: float = 1e-3
    perceptual_weight: float = 1.0
    adv_weight: float = 0.5
    ar_gamma: float = 0.0
    ar_vae_enabled: bool = False
    ar_spec: ARVaeSpec | None = None
    kl_mode: str = "reference"  # see losses/kl.py (SURVEY.md §2.4.1)
    use_perceptual: bool = True


def _masked_mean(per_sample: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid samples (padding-safe batch mean)."""
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _per_sample_recon(pred, target, kind: str) -> jnp.ndarray:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    per = jnp.abs(diff) if kind != "l2" else jnp.square(diff)
    return jnp.mean(per, axis=tuple(range(1, per.ndim)))


def _per_sample_kl(z_mu, z_sigma, mode: str) -> jnp.ndarray:
    """Per-sample KL matching losses/kl.py semantics (sum over non-batch dims)."""
    z_mu = z_mu.astype(jnp.float32)
    second = z_sigma.astype(jnp.float32)
    if mode == "corrected":
        second = jnp.log(jnp.square(second) + 1e-8)
    axes = tuple(range(1, second.ndim))
    return -0.5 * jnp.sum(1.0 + second - jnp.square(z_mu) - jnp.exp(second), axis=axes)


def _per_sample_lsgan(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    per = jnp.square(logits.astype(jnp.float32) - target)
    return jnp.mean(per, axis=tuple(range(1, per.ndim)))


def _generator_losses(
    model, disc, lcfg: LossConfig, params_g, params_d, lpips_params,
    images, mask, attributes, rng, adv_active: bool,
):
    """All generator-side loss terms; shared by train and eval paths."""
    rng_sample, rng_ar = jax.random.split(rng)
    recon, z_mu, z_sigma = model.apply(params_g, images, rng_sample)

    recon_ps = _per_sample_recon(recon, images, lcfg.recon_loss)
    recons_loss = _masked_mean(recon_ps, mask)
    kl_loss = _masked_mean(_per_sample_kl(z_mu, z_sigma, lcfg.kl_mode), mask)

    if lcfg.use_perceptual:
        # LPIPS trunk follows the model's precision policy (bf16 on TPU);
        # the per-tap normalize/weight accumulation inside stays f32.
        # 5-D (NDHWC) inputs take the fake-3D slicing path (the MONAI
        # spatial_dims=3 PerceptualLoss approach; models/lpips.py).
        lpips_dtype = getattr(model, "compute_dtype", jnp.float32)
        if recon.ndim not in (4, 5):
            raise ValueError(
                f"perceptual loss supports 2-D (NHWC) and 3-D (NDHWC) models "
                f"only, got rank-{recon.ndim} reconstruction; set "
                f"perceptual_weight=0 / use_perceptual=False for "
                f"spatial_dims=1"
            )
        lpips_fn = (
            lpips_distance_per_sample_3d if recon.ndim == 5
            else lpips_distance_per_sample
        )
        p_loss = _masked_mean(
            lpips_fn(lpips_params, recon, images, lpips_dtype), mask
        )
    else:
        p_loss = jnp.zeros((), jnp.float32)

    if adv_active and disc is not None:
        logits_fake = disc.apply(params_d, recon)[-1]
        adv_gen = _masked_mean(_per_sample_lsgan(logits_fake, 1.0), mask)
    else:
        adv_gen = jnp.zeros((), jnp.float32)

    ar_loss = jnp.zeros((), jnp.float32)
    ar_per_attr: dict[str, jnp.ndarray] = {}
    if lcfg.ar_vae_enabled and lcfg.ar_spec is not None:
        ar_loss, ar_per_attr, _ = compute_ar_vae_loss(
            z_mu, attributes, lcfg.ar_spec, rng=rng_ar, sample_mask=mask
        )

    total = compute_total_loss(
        recons_loss, kl_loss, p_loss, adv_gen, ar_loss,
        kl_weight=lcfg.kl_weight,
        perceptual_weight=lcfg.perceptual_weight,
        adv_weight=lcfg.adv_weight,
        ar_gamma=lcfg.ar_gamma,
        ar_vae_enabled=lcfg.ar_vae_enabled,
    )
    aux = {
        "recon": recon,
        "z_mu": z_mu,
        "z_sigma": z_sigma,
        "recon_loss": recons_loss,
        "kl_loss": kl_loss,
        "perceptual_loss": p_loss,
        "adv_gen_loss": adv_gen,
        "ar_loss": ar_loss,
        "ar_per_attr": ar_per_attr,
    }
    return total, aux


def make_train_step(
    model,
    disc,
    lcfg: LossConfig,
    *,
    adv_active: bool,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    ``adv_active`` is the static warm-up gate (``epoch > 5`` in the
    reference); build one step per phase. Signature of the returned fn:

        new_state, metrics = step(state, images, mask, attributes, lpips_params, rng)
    """

    def step(state: GanTrainState, images, mask, attributes, lpips_params, rng):
        def loss_fn(params_g):
            total, aux = _generator_losses(
                model, disc, lcfg, params_g, state.params_d, lpips_params,
                images, mask, attributes, rng, adv_active,
            )
            return total, aux

        (loss_g, aux), grads_g = jax.value_and_grad(loss_fn, has_aux=True)(state.params_g)
        state = state.apply_g(grads_g)

        disc_loss = jnp.zeros((), jnp.float32)
        if adv_active and disc is not None:
            recon_detached = jax.lax.stop_gradient(aux["recon"])

            def d_loss_fn(params_d):
                logits_fake = disc.apply(params_d, recon_detached)[-1]
                logits_real = disc.apply(params_d, images)[-1]
                fake = _masked_mean(_per_sample_lsgan(logits_fake, 0.0), mask)
                real = _masked_mean(_per_sample_lsgan(logits_real, 1.0), mask)
                d = 0.5 * (fake + real)
                # Reference scales the D objective by adv_weight
                # (``train_vae.py:456``).
                return lcfg.adv_weight * d, d

            (_, disc_loss), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.params_d
            )
            state = state.apply_d(grads_d)

        metrics = {
            "train/recon_loss": aux["recon_loss"],
            "train/kl_loss": aux["kl_loss"],
            "train/perceptual_loss": aux["perceptual_loss"],
            "train/adv_gen_loss": lcfg.adv_weight * aux["adv_gen_loss"] if adv_active else jnp.zeros((), jnp.float32),
            "train/adv_disc_loss": lcfg.adv_weight * disc_loss if adv_active else jnp.zeros((), jnp.float32),
            "train/loss_total": loss_g,
        }
        if lcfg.ar_vae_enabled:
            metrics["train/ar_loss_total"] = aux["ar_loss"]
            for name, val in aux["ar_per_attr"].items():
                metrics[f"train/ar_loss_{name}"] = val
        # Debug stats (reference ``train_vae.py:432-442``), cheap scalars.
        metrics["debug/z_mu_mean"] = jnp.mean(aux["z_mu"])
        metrics["debug/z_sigma_mean"] = jnp.mean(aux["z_sigma"])
        return state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model, disc, lcfg: LossConfig, *, adv_active: bool) -> Callable:
    """Validation step (reference ``validate``, ``train_vae.py:498-672``):
    stochastic forward, all loss terms, plus the D loss on detached inputs.

    Returns ``(metrics, reconstruction)`` so the caller can dump triplets.
    """

    def step(state: GanTrainState, images, mask, attributes, lpips_params, rng):
        total, aux = _generator_losses(
            model, disc, lcfg, state.params_g, state.params_d, lpips_params,
            images, mask, attributes, rng, adv_active,
        )
        disc_loss = jnp.zeros((), jnp.float32)
        if adv_active and disc is not None:
            logits_fake = disc.apply(state.params_d, jax.lax.stop_gradient(aux["recon"]))[-1]
            logits_real = disc.apply(state.params_d, images)[-1]
            fake = _masked_mean(_per_sample_lsgan(logits_fake, 0.0), mask)
            real = _masked_mean(_per_sample_lsgan(logits_real, 1.0), mask)
            disc_loss = 0.5 * (fake + real)
        metrics = {
            "recon_loss": aux["recon_loss"],
            "kl_loss": aux["kl_loss"],
            "perceptual_loss": aux["perceptual_loss"],
            "adv_gen_loss": aux["adv_gen_loss"],
            "adv_disc_loss": disc_loss,
            "ar_loss": aux["ar_loss"],
            "loss_total": total,
        }
        for name, val in aux["ar_per_attr"].items():
            metrics[f"ar_loss_{name}"] = val
        return metrics, aux["recon"]

    return jax.jit(step)


def make_inference_fn(model) -> Callable:
    """Deterministic encode->decode (reference
    ``reconstruct_deterministic``, ``autoencoder.py:153-163``), jitted."""

    @jax.jit
    def reconstruct(params, images):
        return model.apply(params, images, method=model.reconstruct_deterministic)

    return reconstruct
