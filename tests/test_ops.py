"""Ops tests: area resize vs torch interpolate, group/instance norm vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pti_ldm_vae_tpu.ops.norm import group_norm, group_norm_silu, instance_norm
from pti_ldm_vae_tpu.ops.resize import resize_area, upsample_nearest_2x


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((512, 1024), (256, 256)), ((300, 200), (256, 256)), ((64, 64), (128, 128)), ((100, 77), (50, 33))],
)
def test_resize_area_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_area(jnp.asarray(x), out_hw))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="area")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_upsample_nearest_2x_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 5, 3)).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)
    ours = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=16, eps=1e-6))
    gn = torch.nn.GroupNorm(16, 32, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        theirs = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_group_norm_silu():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))
    y = group_norm_silu(x, scale, bias, num_groups=4)
    ref = group_norm(x, scale, bias, num_groups=4)
    ref = ref * (1.0 / (1.0 + np.exp(-np.asarray(ref))))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_group_norm_one_pass_matches_two_pass():
    """"one_pass" stats (mean/E[x^2] in one fused HBM read) must match the
    centered two-pass form in values AND gradients — it is a pure
    performance lever (ops/norm.py, tools/train_step_hbm_model.py)."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32) * 3.0 + 1.5
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)

    def loss(xx, stats):
        y = group_norm(xx, jnp.asarray(scale), jnp.asarray(bias),
                       num_groups=16, eps=1e-6, stats=stats)
        return jnp.sum(jnp.square(y)), y

    (l2, y2), g2 = jax.value_and_grad(loss, has_aux=True)(jnp.asarray(x), "two_pass")
    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(jnp.asarray(x), "one_pass")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    with pytest.raises(ValueError, match="stats"):
        group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                   num_groups=16, stats="welford")


def test_autoencoder_norm_stats_config_reachable():
    """Top-level "norm_stats" drives the model like "remat" does; one_pass
    and two_pass models share parameters and agree on the forward."""
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config

    cfg = {"spatial_dims": 2, "in_channels": 1, "out_channels": 1,
           "latent_channels": 4, "channels": [8, 16], "num_res_blocks": 1,
           "norm_num_groups": 4, "norm_eps": 1e-6,
           "attention_levels": [False, True],
           "with_encoder_nonlocal_attn": True,
           "with_decoder_nonlocal_attn": True}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 1)).astype(np.float32))
    # pin two_pass explicitly: the default is one_pass now, and this test
    # must keep comparing the two formulations (advisor r4 finding)
    m2 = autoencoder_from_config(cfg, norm_stats="two_pass")
    m1 = autoencoder_from_config(cfg, norm_stats="one_pass")
    assert m2.norm_stats == "two_pass" and m1.norm_stats == "one_pass"
    params = m2.init(jax.random.key(0), x, jax.random.key(1))
    r2 = m2.apply(params, x, jax.random.key(2))
    r1 = m1.apply(params, x, jax.random.key(2))
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 9, 7, 5)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    theirs = (
        torch.nn.functional.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
