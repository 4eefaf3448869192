"""Small-utility coverage: multihost no-op, profiling timer, dotenv,
visualization helpers."""

import os

import numpy as np

from pti_ldm_vae_tpu.parallel.multihost import maybe_initialize_distributed
from pti_ldm_vae_tpu.utils.logging import load_dotenv
from pti_ldm_vae_tpu.utils.profiling import StepTimer, trace_if
from pti_ldm_vae_tpu.utils.visualization import (
    normalize_batch_for_display,
    normalize_image_to_uint8,
    visualize_2d_image,
    visualize_one_slice_in_3d_image,
)


def test_multihost_noop_single_process():
    # No coordinator env, single host -> returns False, no initialization.
    assert maybe_initialize_distributed() is False
    assert maybe_initialize_distributed() is False  # idempotent


def test_step_timer():
    timer = StepTimer()
    for _ in range(5):
        timer.tick()
    summary = timer.summary()
    assert summary["steps"] == 5
    assert summary["p50_s"] >= 0 and summary["max_s"] >= summary["p50_s"]
    assert StepTimer().summary() == {}


def test_trace_if_disabled_is_noop(tmp_path):
    with trace_if(str(tmp_path), enabled=False):
        pass
    assert list(tmp_path.iterdir()) == []


def test_load_dotenv(tmp_path, monkeypatch):
    env_file = tmp_path / ".env"
    env_file.write_text("WANDB_PROJECT=from-dotenv\n# comment\nWANDB_ENTITY='team'\n")
    monkeypatch.delenv("WANDB_PROJECT", raising=False)
    monkeypatch.setenv("WANDB_ENTITY", "preexisting")
    load_dotenv(str(env_file))
    assert os.environ["WANDB_PROJECT"] == "from-dotenv"
    assert os.environ["WANDB_ENTITY"] == "preexisting"  # env wins
    monkeypatch.delenv("WANDB_PROJECT")


def test_display_normalization_reference_semantics():
    batch = np.zeros((1, 8, 8, 1), dtype=np.float32)
    batch[0, 2:6, 2:6, 0] = np.linspace(0.5, 2.0, 16).reshape(4, 4)
    out = normalize_batch_for_display(batch)
    assert out.shape == batch.shape
    assert out.min() >= 0 and out.max() <= 1
    assert np.all(out[0, 0, :, 0] == 0)  # background stays black
    # all-zero image -> all zeros, no NaN
    zero = normalize_batch_for_display(np.zeros((1, 4, 4, 1), np.float32))
    assert np.all(zero == 0)


def test_uint8_and_rgb_helpers():
    img = np.linspace(-1, 1, 16).reshape(4, 4).astype(np.float32)
    u8 = normalize_image_to_uint8(img)
    assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0
    rgb = visualize_2d_image(img)
    assert rgb.shape == (4, 4, 3)
    vol = np.random.default_rng(0).uniform(size=(4, 4, 6)).astype(np.float32)
    slice_rgb = visualize_one_slice_in_3d_image(vol, axis=2)
    assert slice_rgb.shape == (4, 4, 3)
    import pytest

    with pytest.raises(ValueError):
        visualize_one_slice_in_3d_image(vol, axis=5)


def test_load_vae_model_honors_remat(tmp_path):
    """The top-level "remat" config key reaches the model built by
    utils.vae_loader.load_vae_model (dict and namespace configs)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.utils.vae_loader import load_vae_model

    ae_def = dict(
        spatial_dims=2, in_channels=1, out_channels=1, latent_channels=4,
        channels=[8, 16], num_res_blocks=1, norm_num_groups=4,
        attention_levels=[False, False],
    )
    params = autoencoder_from_config(ae_def).init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    ckpt = tmp_path / "ckpt"
    save_pytree(str(ckpt), params)

    model, _ = load_vae_model({"autoencoder_def": ae_def, "remat": True}, str(ckpt))
    assert model.remat is True
    model, _ = load_vae_model({"autoencoder_def": ae_def}, str(ckpt))
    assert model.remat is False
    ns = SimpleNamespace(autoencoder_def=ae_def, remat=True)
    assert load_vae_model(ns, str(ckpt))[0].remat is True
