"""Loss-library golden tests.

The reference's pure-torch loss modules (``models/losses.py``,
``utils/eval_metrics.py``) are loaded straight from the read-only reference
tree and used as numeric oracles — the strongest available parity check
without MONAI installed.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pti_ldm_vae_tpu.losses.adversarial import discriminator_loss, generator_loss, lsgan_loss
from pti_ldm_vae_tpu.losses.ar_vae import compute_ar_vae_loss, make_ar_vae_spec
from pti_ldm_vae_tpu.losses.composite import compute_total_loss, reconstruction_loss
from pti_ldm_vae_tpu.losses.kl import compute_kl_loss, kl_from_forward
from pti_ldm_vae_tpu.utils.eval_metrics import compute_psnr, compute_ssim


def _load_reference_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_losses = _load_reference_module(
    "ref_losses", "/root/reference/src/pti_ldm_vae/models/losses.py"
)
ref_eval_metrics = _load_reference_module(
    "ref_eval_metrics", "/root/reference/src/pti_ldm_vae/utils/eval_metrics.py"
)


def test_kl_matches_reference():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(4, 8, 8, 4)).astype(np.float32)  # NHWC here
    lv = rng.normal(size=(4, 8, 8, 4)).astype(np.float32)
    ours = float(compute_kl_loss(jnp.asarray(mu), jnp.asarray(lv)))
    # KL sums over all non-batch dims; layout doesn't matter.
    theirs = float(ref_losses.compute_kl_loss(torch.from_numpy(mu), torch.from_numpy(lv)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    ours_sigma = float(
        compute_kl_loss(jnp.asarray(mu), jnp.asarray(np.abs(lv)), input_is_logvar=False)
    )
    theirs_sigma = float(
        ref_losses.compute_kl_loss(
            torch.from_numpy(mu), torch.from_numpy(np.abs(lv)), input_is_logvar=False
        )
    )
    np.testing.assert_allclose(ours_sigma, theirs_sigma, rtol=1e-5)


def test_kl_from_forward_modes():
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(2, 4, 4, 2)).astype(np.float32))
    sigma = jnp.asarray(np.abs(rng.normal(size=(2, 4, 4, 2))).astype(np.float32))
    ref_mode = kl_from_forward(mu, sigma, mode="reference")
    np.testing.assert_allclose(float(ref_mode), float(compute_kl_loss(mu, sigma)), rtol=1e-6)
    corr = kl_from_forward(mu, sigma, mode="corrected")
    np.testing.assert_allclose(
        float(corr), float(compute_kl_loss(mu, sigma, input_is_logvar=False)), rtol=1e-6
    )


def test_total_loss_matches_reference():
    vals = dict(recons_loss=0.3, kl_loss=2.0, perceptual_loss=0.7, adv_gen_loss=0.1, ar_loss=0.4)
    weights = dict(kl_weight=1e-3, perceptual_weight=1.0, adv_weight=3.0, ar_gamma=0.5)
    for ar_enabled in (False, True):
        ours = compute_total_loss(**vals, **weights, ar_vae_enabled=ar_enabled)
        theirs = ref_losses.compute_total_loss(
            **{k: torch.tensor(v) for k, v in vals.items()}, **weights, ar_vae_enabled=ar_enabled
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)


def test_ar_vae_all_pairs_matches_reference():
    rng = np.random.default_rng(2)
    batch, latent_c = 6, 8
    latents = rng.normal(size=(batch, latent_c)).astype(np.float32)
    attrs_np = {
        "height_0": rng.normal(size=(batch,)).astype(np.float32),
        "width_0": rng.integers(0, 2, size=(batch,)).astype(np.float32),  # has ties
    }
    mapping = {
        "height_0": {"latent_channel": 0, "delta": 1.0},
        "width_0": {"latent_channel": 3, "delta": 2.0},
    }
    spec = make_ar_vae_spec(mapping, pairwise_mode="all", latent_dim=latent_c)
    total, per_attr, counts = compute_ar_vae_loss(
        jnp.asarray(latents), {k: jnp.asarray(v) for k, v in attrs_np.items()}, spec
    )
    ref_total, ref_per_attr, ref_counts, _ = ref_losses.compute_ar_vae_loss(
        torch.from_numpy(latents),
        {k: torch.from_numpy(v) for k, v in attrs_np.items()},
        mapping,
        "all",
        None,
        None,
    )
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    for name in mapping:
        np.testing.assert_allclose(float(per_attr[name]), float(ref_per_attr[name]), rtol=1e-5)
        assert int(counts[name]) == ref_counts[name]


def test_ar_vae_4d_latents_pooled():
    rng = np.random.default_rng(3)
    batch = 4
    lat_nhwc = rng.normal(size=(batch, 3, 3, 6)).astype(np.float32)
    attrs = {"a": rng.normal(size=(batch,)).astype(np.float32)}
    mapping = {"a": {"latent_channel": 2, "delta": 1.0}}
    spec = make_ar_vae_spec(mapping)
    total, _, _ = compute_ar_vae_loss(jnp.asarray(lat_nhwc), {"a": jnp.asarray(attrs["a"])}, spec)
    # Reference pools NCHW over dims (2, 3); ours pools NHWC over (1, 2).
    lat_nchw = np.transpose(lat_nhwc, (0, 3, 1, 2))
    ref_total, *_ = ref_losses.compute_ar_vae_loss(
        torch.from_numpy(lat_nchw), {"a": torch.from_numpy(attrs["a"])}, mapping, "all", None, None
    )
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


def test_ar_vae_delta_global_fallback():
    mapping = {"a": {"latent_channel": 0}}
    spec = make_ar_vae_spec(mapping, delta_global={"enabled": True, "value": 2.5})
    assert spec.deltas == (2.5,)
    import pytest

    with pytest.raises(ValueError):
        make_ar_vae_spec({"a": {"latent_channel": 0}})


def test_ar_vae_subset_static_shape():
    rng = np.random.default_rng(4)
    batch = 8
    latents = jnp.asarray(rng.normal(size=(batch, 4)).astype(np.float32))
    attrs = {"a": jnp.asarray(rng.normal(size=(batch,)).astype(np.float32))}
    spec = make_ar_vae_spec(
        {"a": {"latent_channel": 1, "delta": 1.0}}, pairwise_mode="subset", subset_pairs=10
    )
    total, _, counts = jax.jit(
        lambda z, a, key: compute_ar_vae_loss(z, a, spec, rng=key)
    )(latents, attrs, jax.random.key(0))
    assert np.isfinite(float(total))
    assert int(counts["a"]) <= 10


def test_lsgan_losses():
    logits = jnp.asarray(np.linspace(-1, 2, 12, dtype=np.float32).reshape(1, 3, 4, 1))
    np.testing.assert_allclose(
        float(lsgan_loss(logits, True)), float(np.mean((np.asarray(logits) - 1) ** 2)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(generator_loss(logits)), float(lsgan_loss(logits, True)), rtol=1e-6
    )
    d = discriminator_loss(logits, logits * 0.5)
    expected = 0.5 * (
        np.mean(np.asarray(logits) ** 2) + np.mean((np.asarray(logits) * 0.5 - 1) ** 2)
    )
    np.testing.assert_allclose(float(d), expected, rtol=1e-6)


def test_reconstruction_loss_kinds():
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[0.0, 4.0]])
    np.testing.assert_allclose(float(reconstruction_loss(a, b, "l1")), 1.5)
    np.testing.assert_allclose(float(reconstruction_loss(a, b, "l2")), 2.5)


def test_psnr_ssim_match_reference():
    rng = np.random.default_rng(5)
    pred = rng.uniform(0, 1, size=(3, 32, 32, 1)).astype(np.float32)
    target = np.clip(pred + rng.normal(scale=0.05, size=pred.shape), 0, 1).astype(np.float32)

    ours_psnr = np.asarray(compute_psnr(jnp.asarray(pred), jnp.asarray(target)))
    ours_ssim = np.asarray(compute_ssim(jnp.asarray(pred), jnp.asarray(target)))

    pred_t = torch.from_numpy(pred).permute(0, 3, 1, 2)
    target_t = torch.from_numpy(target).permute(0, 3, 1, 2)
    theirs_psnr = ref_eval_metrics.compute_psnr(pred_t, target_t).numpy()
    theirs_ssim = ref_eval_metrics.compute_ssim(pred_t, target_t).numpy()

    np.testing.assert_allclose(ours_psnr, theirs_psnr, rtol=1e-4)
    np.testing.assert_allclose(ours_ssim, theirs_ssim, rtol=1e-4, atol=1e-5)
