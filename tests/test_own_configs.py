"""This repo's example configs resolve and drive the model builders."""

import glob

import jax

from pti_ldm_vae_tpu.config import load_config
from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
from pti_ldm_vae_tpu.models.unet import diffusion_unet_from_config
from pti_ldm_vae_tpu.train.loop import resolve_ar_settings


def test_all_own_configs_resolve():
    paths = glob.glob("/root/repo/config/*.json")
    assert len(paths) >= 7
    for path in paths:
        cfg = load_config(path)
        assert isinstance(cfg, dict)


def test_vae_configs_build_models():
    for path in glob.glob("/root/repo/config/*vae*.json"):
        cfg = load_config(path)
        model = autoencoder_from_config(cfg["autoencoder_def"])
        assert model.latent_channels == cfg["latent_channels"]
        ar = resolve_ar_settings(cfg)
        assert isinstance(ar["enabled"], bool)
        # AR refs resolved through @regularized_attributes
        assert cfg["autoencoder_train"]["ar_vae_enabled"] == cfg["regularized_attributes"]["enabled"]


def test_ldm_config_builds_unet():
    cfg = load_config("/root/repo/config/ldm_dente.json")
    unet = diffusion_unet_from_config(cfg["diffusion_def"])
    import jax.numpy as jnp

    out = jax.eval_shape(
        lambda: unet.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 16, 512)),
        )
    )
    assert out is not None
