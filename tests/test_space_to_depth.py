"""Equivalence proofs for the space-to-depth conv reformulation.

Every transform in ops/space_to_depth.py must reproduce the original op
EXACTLY (same math, different schedule) — these tests pin that, op by op,
before the model-level knob composes them (test_autoencoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.ops.space_to_depth import (
    depth_to_space,
    s2d_conv1x1_kernel,
    s2d_conv3x3_kernel,
    s2d_downsample_kernel,
    s2d_repeat_channels,
    space_to_depth,
)


def _conv(x, w, *, strides=(1, 1), padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip_and_layout():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 3)).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 4, 3, 12)
    # channel-major phase layout: channel c*4 + (2a+b) holds x[2i+a, 2j+b, c]
    np.testing.assert_array_equal(np.asarray(y[0, 1, 1, 2 * 4 + 2 * 1 + 0]),
                                  np.asarray(x[0, 3, 2, 2]))
    np.testing.assert_array_equal(np.asarray(depth_to_space(y)), np.asarray(x))


def test_s2d_conv3x3_equivalence():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))

    ref = _conv(x, w, padding=((1, 1), (1, 1)))
    got = depth_to_space(
        _conv(space_to_depth(x), s2d_conv3x3_kernel(w), padding=((1, 1), (1, 1)))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv1x1_equivalence():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 1, 6, 4)).astype(np.float32))

    ref = _conv(x, w, padding=((0, 0), (0, 0)))
    got = depth_to_space(
        _conv(space_to_depth(x), s2d_conv1x1_kernel(w), padding=((0, 0), (0, 0)))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_s2d_downsample_equivalence():
    """pad (0,1) + VALID 3x3 stride-2 == pad (0,1) + VALID 2x2 stride-1 on
    the s2d tensor (and the result EXITS the s2d domain)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))

    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref = _conv(xp, w, strides=(2, 2), padding=((0, 0), (0, 0)))

    xs = jnp.pad(space_to_depth(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
    got = _conv(xs, s2d_downsample_kernel(w), padding=((0, 0), (0, 0)))
    assert got.shape == ref.shape  # half-res, UN-expanded channels
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_repeat_channels_is_nearest_upsample():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(s2d_repeat_channels(x))), np.asarray(up)
    )


def test_s2d_groupnorm_equivalence():
    """GroupNorm with the SAME num_groups on the s2d tensor (scale/bias
    repeated 4x) reproduces full-res GroupNorm: the channel-major phase
    layout keeps each group's element set identical."""
    from pti_ldm_vae_tpu.ops.norm import group_norm

    rng = np.random.default_rng(5)
    c, groups = 8, 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    ref = group_norm(x, scale, bias, num_groups=groups, eps=1e-6)
    got = depth_to_space(group_norm(
        space_to_depth(x), jnp.repeat(scale, 4), jnp.repeat(bias, 4),
        num_groups=groups, eps=1e-6,
    ))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("size", [(16, 12), (8, 8)])
def test_s2d_stacked_level_equivalence(size):
    """A full level-0-shaped stack (conv_in -> [GN+SiLU -> conv3x3]x2 +
    skip -> downsample) composed entirely in the s2d domain matches the
    full-res stack — the end-to-end shape of the encoder-stem rewrite."""
    from pti_ldm_vae_tpu.ops.norm import group_norm_silu

    rng = np.random.default_rng(6)
    h, w_ = size
    cin, c = 1, 8
    groups = 4
    x = jnp.asarray(rng.normal(size=(2, h, w_, cin)).astype(np.float32))
    w_in = jnp.asarray(rng.normal(size=(3, 3, cin, c)).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.3)
    wd = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.3)
    g1 = jnp.ones((c,))
    b1 = jnp.zeros((c,))

    def full(x):
        h0 = _conv(x, w_in, padding=((1, 1), (1, 1)))
        h1 = group_norm_silu(h0, g1, b1, num_groups=groups, eps=1e-6)
        h1 = _conv(h1, w1, padding=((1, 1), (1, 1)))
        h1 = group_norm_silu(h1, g1, b1, num_groups=groups, eps=1e-6)
        h1 = _conv(h1, w2, padding=((1, 1), (1, 1)))
        h0 = h0 + h1  # residual
        hp = jnp.pad(h0, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(hp, wd, strides=(2, 2), padding=((0, 0), (0, 0)))

    def s2d_form(x):
        xs = space_to_depth(x)
        h0 = _conv(xs, s2d_conv3x3_kernel(w_in), padding=((1, 1), (1, 1)))
        g4, b4 = jnp.repeat(g1, 4), jnp.repeat(b1, 4)
        h1 = group_norm_silu(h0, g4, b4, num_groups=groups, eps=1e-6)
        h1 = _conv(h1, s2d_conv3x3_kernel(w1), padding=((1, 1), (1, 1)))
        h1 = group_norm_silu(h1, g4, b4, num_groups=groups, eps=1e-6)
        h1 = _conv(h1, s2d_conv3x3_kernel(w2), padding=((1, 1), (1, 1)))
        h0 = h0 + h1
        hp = jnp.pad(h0, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(hp, s2d_downsample_kernel(wd), padding=((0, 0), (0, 0)))

    np.testing.assert_allclose(np.asarray(s2d_form(x)), np.asarray(full(x)),
                               rtol=1e-4, atol=1e-4)


def test_s2d_auto_mode_policy():
    """Pin the measured "auto" policy (docs/s2d_ab_v5e.jsonl): per-workload,
    per-side batch gates. These thresholds are calibration data — if the
    table is re-measured on new hardware, update ops/space_to_depth.py AND
    this test together."""
    from pti_ldm_vae_tpu.ops.space_to_depth import s2d_auto_mode

    # train: encoder-only at/below the measured crossover, standard above
    assert s2d_auto_mode("train", 8) == "encoder"
    assert s2d_auto_mode("train", 64) == "encoder"
    assert s2d_auto_mode("train", 128) is False
    assert s2d_auto_mode("train", None) is False  # unknown -> conservative

    # inference: both sides at small batch (+69% b8), encoder-only in the
    # mid range, standard at large batch
    assert s2d_auto_mode("inference", 8) is True
    assert s2d_auto_mode("inference", 32) is True
    assert s2d_auto_mode("inference", 64) == "encoder"
    assert s2d_auto_mode("inference", 128) is False
    assert s2d_auto_mode("inference", None) == "encoder"

    with pytest.raises(ValueError):
        s2d_auto_mode("sampling", 8)
