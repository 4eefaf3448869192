from .adversarial import discriminator_loss, generator_loss, lsgan_loss
from .ar_vae import ARVaeSpec, compute_ar_vae_loss, make_ar_vae_spec
from .composite import compute_total_loss, l1_loss, l2_loss, reconstruction_loss
from .kl import compute_kl_loss, kl_from_forward

__all__ = [
    "ARVaeSpec",
    "compute_ar_vae_loss",
    "compute_kl_loss",
    "compute_total_loss",
    "discriminator_loss",
    "generator_loss",
    "kl_from_forward",
    "l1_loss",
    "l2_loss",
    "lsgan_loss",
    "make_ar_vae_spec",
    "reconstruction_loss",
]
