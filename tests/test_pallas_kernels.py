"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.ops.norm import group_norm_silu
from pti_ldm_vae_tpu.ops.attention import multi_head_attention


def test_groupnorm_silu_pallas_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    expected = group_norm_silu(x, scale, bias, num_groups=4)
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu(x, scale, bias, num_groups=4, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_groupnorm_silu_pallas_grad():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))

    def loss_ref(x):
        return jnp.sum(group_norm_silu(x, scale, bias, num_groups=2) ** 2)

    def loss_pallas(x):
        return jnp.sum(group_norm_silu(x, scale, bias, num_groups=2, use_pallas=True) ** 2)

    g_ref = jax.grad(loss_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    b, s, c, heads = 2, 64, 32, 2
    q = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    expected = multi_head_attention(q, k, v, num_heads=heads)
    with pltpu.force_tpu_interpret_mode():
        got = multi_head_attention(q, k, v, num_heads=heads, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5)


def test_flash_attention_multi_block():
    """Sequence longer than the q tile exercises the running-softmax path."""
    from jax.experimental.pallas import tpu as pltpu
    from pti_ldm_vae_tpu.ops.pallas.flash_attention import _xla_reference, flash_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 1, 512, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 512, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 512, 16)).astype(np.float32))
    expected = _xla_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=2e-5)


def test_conv3x3_pallas_forward_and_grads():
    """im2col-in-VMEM conv kernel: forward + custom-vjp grads match XLA conv.

    Measured SLOWER than XLA's conv emitter on v5e (lane-relayout cost of the
    in-VMEM patch concat — docs/ARCHITECTURE.md); kept as a tested alternate,
    like the GroupNorm kernel. Measurement, not assumption.
    """
    from jax.experimental.pallas import tpu as pltpu

    from pti_ldm_vae_tpu.ops.pallas.conv2d import conv3x3, conv3x3_pallas_supported

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)
    assert conv3x3_pallas_supported(x.shape, k.shape)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

    with pltpu.force_tpu_interpret_mode():
        out = conv3x3(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def loss_pallas(x, k):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.sin(conv3x3(x, k)))

    def loss_ref(x, k):
        y = jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        return jnp.sum(jnp.sin(y))

    with pltpu.force_tpu_interpret_mode():
        gx, gk = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=1e-3, atol=1e-4)


def test_attention_auto_gate():
    """use_pallas=None resolves to XLA on CPU and by seq length on TPU."""
    from pti_ldm_vae_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    # On the CPU test backend the auto gate must take the XLA path (identical
    # results to an explicit False).
    auto = multi_head_attention(q, q, q, num_heads=2, use_pallas=None)
    xla = multi_head_attention(q, q, q, num_heads=2, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(xla))


def test_groupnorm_silu_pallas_fused_backward():
    """The fused Pallas backward (reduce + dx kernels) matches the XLA
    reference vjp for dx, dgamma, dbeta — including the saved-stats path
    (mean/inv from the forward, no recompute)."""
    from jax.experimental.pallas import tpu as pltpu

    from pti_ldm_vae_tpu.ops.pallas.groupnorm_silu import (
        _bwd_pallas,
        _forward,
        _xla_reference,
    )

    rng = np.random.default_rng(5)
    num_groups, eps = 4, 1e-6
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    ref_out, vjp = jax.vjp(
        lambda xx, ss, bb: _xla_reference(xx, ss, bb, num_groups, eps), x, scale, bias
    )
    dx_ref, dscale_ref, dbias_ref = vjp(g)

    with pltpu.force_tpu_interpret_mode():
        out, mean_g, inv_g = _forward(x, scale, bias, num_groups, eps)
        dx, dscale, dbias = _bwd_pallas(x, scale, bias, mean_g, inv_g, g, num_groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dscale), np.asarray(dscale_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref), rtol=1e-4, atol=1e-5)


def test_groupnorm_silu_pallas_fused_backward_multiblock():
    """Row-block accumulation across the grid axis (hw > chunk cap)."""
    from jax.experimental.pallas import tpu as pltpu

    from pti_ldm_vae_tpu.ops.pallas import groupnorm_silu as gns

    rng = np.random.default_rng(6)
    num_groups, eps = 2, 1e-6
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 8)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    _, vjp = jax.vjp(
        lambda xx, ss, bb: gns._xla_reference(xx, ss, bb, num_groups, eps), x, scale, bias
    )
    dx_ref, dscale_ref, dbias_ref = vjp(g)

    import unittest.mock as mock

    # Cap the row chunk at 32 so the 128-row image spans 4 grid blocks.
    with mock.patch.object(gns, "_row_chunk", lambda hw, cap=2048: min(hw, 32)):
        with pltpu.force_tpu_interpret_mode():
            _, mean_g, inv_g = gns._forward(x, scale, bias, num_groups, eps)
            dx, dscale, dbias = gns._bwd_pallas(x, scale, bias, mean_g, inv_g, g, num_groups)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dscale), np.asarray(dscale_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref), rtol=1e-4, atol=1e-5)


def test_flash_attention_fused_backward():
    """Whole-matrix Pallas attention backward matches the XLA reference vjp."""
    from jax.experimental.pallas import tpu as pltpu

    from pti_ldm_vae_tpu.ops.pallas.flash_attention import (
        _bwd_pallas,
        _bwd_pallas_supported,
        _xla_reference,
    )

    rng = np.random.default_rng(7)
    b, h, s, d = 2, 2, 128, 32
    assert _bwd_pallas_supported(s, d)
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

    _, vjp = jax.vjp(_xla_reference, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = _bwd_pallas(q, k, v, g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_bwd_gate():
    """Oversized sequences must fall back (VMEM budget gate)."""
    from pti_ldm_vae_tpu.ops.pallas.flash_attention import _bwd_pallas_supported

    assert _bwd_pallas_supported(1024, 128)   # VAE bottleneck shape
    assert not _bwd_pallas_supported(4096, 128)
