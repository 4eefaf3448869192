"""Train/eval step tests: loss decreases, GAN phase works, DP sharding runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.losses.ar_vae import make_ar_vae_spec
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.models.discriminator import PatchDiscriminator
from pti_ldm_vae_tpu.models.lpips import init_lpips_params
from pti_ldm_vae_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from pti_ldm_vae_tpu.train.state import create_train_state
from pti_ldm_vae_tpu.train.steps import LossConfig, make_eval_step, make_inference_fn, make_train_step

TINY = dict(
    in_channels=1, out_channels=1, latent_channels=2,
    channels=(8, 16), num_res_blocks=1, norm_num_groups=4,
    attention_levels=(False, False),
    with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
)


def _setup(adv=False, ar=False, batch=8, hw=16):
    model = AutoencoderKL(**TINY)
    params_g = model.init(jax.random.key(0), jnp.zeros((1, hw, hw, 1)), jax.random.key(1))
    disc = PatchDiscriminator(channels=8, num_layers_d=2) if adv else None
    params_d = disc.init(jax.random.key(2), jnp.zeros((1, hw, hw, 1))) if adv else None
    ar_spec = None
    if ar:
        ar_spec = make_ar_vae_spec(
            {"height_0": {"latent_channel": 0, "delta": 1.0}}, pairwise_mode="all"
        )
    lcfg = LossConfig(
        recon_loss="l1", kl_weight=1e-4, perceptual_weight=0.0, adv_weight=0.5,
        ar_gamma=0.5, ar_vae_enabled=ar, ar_spec=ar_spec, use_perceptual=False,
    )
    state = create_train_state(params_g, lr=2e-3, params_d=params_d)
    rng = np.random.default_rng(0)
    images = rng.uniform(0.2, 1.0, size=(batch, hw, hw, 1)).astype(np.float32)
    mask = np.ones((batch,), dtype=np.float32)
    attrs = {"height_0": rng.normal(size=(batch,)).astype(np.float32)} if ar else {}
    return model, disc, lcfg, state, jnp.asarray(images), jnp.asarray(mask), {
        k: jnp.asarray(v) for k, v in attrs.items()
    }


def test_train_step_decreases_loss():
    model, disc, lcfg, state, images, mask, attrs = _setup()
    step = make_train_step(model, disc, lcfg, adv_active=False, donate=False)
    lpips_params = {}
    losses = []
    for i in range(12):
        state, metrics = step(state, images, mask, attrs, lpips_params, jax.random.key(i))
        losses.append(float(metrics["train/loss_total"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_train_step_with_gan():
    model, disc, lcfg, state, images, mask, attrs = _setup(adv=True)
    step = make_train_step(model, disc, lcfg, adv_active=True, donate=False)
    params_d_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params_d)
    state, metrics = step(state, images, mask, attrs, {}, jax.random.key(0))
    assert float(metrics["train/adv_disc_loss"]) > 0.0
    # Discriminator actually updated.
    changed = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)), params_d_before, state.params_d
    )
    assert any(jax.tree.leaves(changed))


def test_warmup_gate_no_disc_update():
    model, disc, lcfg, state, images, mask, attrs = _setup(adv=True)
    step = make_train_step(model, disc, lcfg, adv_active=False, donate=False)
    params_d_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params_d)
    state, metrics = step(state, images, mask, attrs, {}, jax.random.key(0))
    assert float(metrics["train/adv_gen_loss"]) == 0.0
    assert float(metrics["train/adv_disc_loss"]) == 0.0
    same = jax.tree.map(
        lambda a, b: np.allclose(a, np.asarray(b)), params_d_before, state.params_d
    )
    assert all(jax.tree.leaves(same))


def test_train_step_with_ar_vae():
    model, disc, lcfg, state, images, mask, attrs = _setup(ar=True)
    step = make_train_step(model, disc, lcfg, adv_active=False, donate=False)
    state, metrics = step(state, images, mask, attrs, {}, jax.random.key(0))
    assert "train/ar_loss_total" in metrics
    assert "train/ar_loss_height_0" in metrics
    assert np.isfinite(float(metrics["train/ar_loss_total"]))


def test_padding_mask_invariance():
    """Padded samples must not change any loss value."""
    model, disc, lcfg, state, images, mask, attrs = _setup(batch=8)
    step = make_eval_step(model, disc, lcfg, adv_active=False)
    full_metrics, _ = step(state, images, mask, attrs, {}, jax.random.key(0))

    # Zero out the last 3 samples and mark them invalid.
    images_padded = np.asarray(images).copy()
    images_padded[5:] = 0.0
    mask_padded = np.asarray(mask).copy()
    mask_padded[5:] = 0.0
    padded_metrics, _ = step(
        state, jnp.asarray(images_padded), jnp.asarray(mask_padded), attrs, {}, jax.random.key(0)
    )
    # Compare against eval on just the 5 valid samples.
    small_metrics, _ = step(
        state, images[:5], mask[:5], attrs, {}, jax.random.key(0)
    )
    for key in ("recon_loss", "kl_loss"):
        np.testing.assert_allclose(
            float(padded_metrics[key]), float(small_metrics[key]), rtol=2e-4
        )


def test_train_step_data_parallel_mesh():
    """DDP equivalent: batch sharded over the 8-device CPU mesh."""
    model, disc, lcfg, state, images, mask, attrs = _setup(batch=16)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step = make_train_step(model, disc, lcfg, adv_active=False, donate=False)
    batch = shard_batch(mesh, {"image": images, "mask": mask})
    assert len(batch["image"].sharding.device_set) == 8
    state, metrics = step(state, batch["image"], batch["mask"], attrs, {}, jax.random.key(0))
    assert np.isfinite(float(metrics["train/loss_total"]))
    # Sharded and unsharded runs agree (the psum is exact).
    state2 = _setup(batch=16)[3]
    _, metrics2 = make_train_step(model, disc, lcfg, adv_active=False, donate=False)(
        state2, images, mask, attrs, {}, jax.random.key(0)
    )
    np.testing.assert_allclose(
        float(metrics["train/loss_total"]), float(metrics2["train/loss_total"]), rtol=1e-5
    )


def test_inference_fn_deterministic():
    model, _, _, state, images, _, _ = _setup()
    infer = make_inference_fn(model)
    a = infer(state.params_g, images)
    b = infer(state.params_g, images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == images.shape
