"""tools/train_step_hbm_model.py: the analytic HBM-traffic model's parsing
and fusion-grouping rules, pinned on small lowered programs.

The model's headline claim — two-pass GroupNorm statistics cost two HBM
passes over x while the one_pass formulation costs one — must fall out of
the reduce_traffic() accounting itself, not hand-assumptions."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.train_step_hbm_model import (  # noqa: E402
    conv_boundary_bytes,
    reduce_traffic,
)
from tools.conv_roofline import parse_convs  # noqa: E402


def _lowered(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def test_identical_root_reduces_price_as_one_pass():
    """mean(x) and mean(x^2) share the root {x} -> ONE priced pass; the
    centered variance's roots include the mean output -> TWO passes."""
    x = jnp.zeros((64, 512), jnp.float32)  # 131072 bytes
    nbytes = 64 * 512 * 4

    def one_pass(x):
        return jnp.mean(x) + jnp.mean(jnp.square(x))

    def two_pass(x):
        m = jnp.mean(x)
        return m + jnp.mean(jnp.square(x - m))

    r1 = reduce_traffic(_lowered(one_pass, x))
    r2 = reduce_traffic(_lowered(two_pass, x))
    # one fused pass over x
    assert r1["lower_in"] == nbytes
    # two sequential passes (the second's root set = {x, mean out}; the
    # scalar mean adds only its own few bytes)
    assert 2 * nbytes <= r2["lower_in"] <= 2 * nbytes + 64
    # the naive upper bound counts both reduce inputs either way
    assert r1["upper_in"] == 2 * nbytes
    assert r2["upper_in"] == 2 * nbytes


def test_rooted_read_priced_at_stored_width():
    """A reduce over an f32 convert of a bf16-resident tensor costs the
    bf16 bytes (the convert fuses; the f32 tensor never exists in HBM)."""
    x = jnp.zeros((32, 256), jnp.bfloat16)  # 16384 bytes stored

    def f(x):
        return jnp.sum(x.astype(jnp.float32))

    r = reduce_traffic(_lowered(f, x))
    assert r["lower_in"] == 32 * 256 * 2
    assert r["upper_in"] == 32 * 256 * 4


def test_one_pass_model_shrinks_reduce_traffic_on_the_vae():
    """On an actual (tiny) VAE train-step lowering, the one_pass stats
    formulation must strictly shrink rooted reduce traffic and leave the
    conv set untouched."""
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    config = {
        "spatial_dims": 2, "in_channels": 1, "out_channels": 1,
        "latent_channels": 2, "channels": [4, 8], "num_res_blocks": 1,
        "norm_num_groups": 2, "norm_eps": 1e-6,
        "attention_levels": [False, False],
        "with_encoder_nonlocal_attn": False,
        "with_decoder_nonlocal_attn": False,
    }
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=0.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=False)
    images = jnp.zeros((2, 16, 16, 1), jnp.float32)
    mask = jnp.ones((2,), jnp.float32)
    lpips = init_lpips_params()

    texts = {}
    for stats in ("two_pass", "one_pass"):
        model = autoencoder_from_config(config, norm_stats=stats)
        params = model.init(jax.random.key(0), images[:1], jax.random.key(1))
        state = create_train_state(params, lr=1e-4)
        step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
        texts[stats] = step.lower(
            state, images, mask, {}, lpips, jax.random.key(2)).as_text()

    red2 = reduce_traffic(texts["two_pass"])
    red1 = reduce_traffic(texts["one_pass"])
    assert red1["lower_in"] < red2["lower_in"]
    convs2 = parse_convs(texts["two_pass"])
    convs1 = parse_convs(texts["one_pass"])
    assert len(convs1) == len(convs2)
    assert conv_boundary_bytes(convs1) == conv_boundary_bytes(convs2)
    # numerics of the two formulations agree (same params)
    model2 = autoencoder_from_config(config, norm_stats="two_pass")
    model1 = autoencoder_from_config(config, norm_stats="one_pass")
    p = model2.init(jax.random.key(0), images[:1], jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 16, 1)).astype(np.float32))
    r2 = model2.apply(p, x, jax.random.key(3))
    r1 = model1.apply(p, x, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r2[0]), atol=5e-5)


@pytest.mark.slow
def test_ddim_mode_prices_the_sampler(tmp_path):
    """--mode ddim lowers the flagship 50-step sampler and scales every
    category by the body multiplier; attention-softmax reduces are priced
    as their own XLA-only category (Pallas owns them on TPU)."""
    import json

    from tools.train_step_hbm_model import main

    out = tmp_path / "ddim.json"
    assert main(["--mode", "ddim", "--batch", "2", "--json", str(out)]) == 0
    d = json.loads(out.read_text())
    assert d["mode"] == "ddim"
    assert d["body_mult"] == 50
    assert d["bytes"]["optimizer"] == 0
    assert d["bytes"]["conv_boundary"] > 0
    assert d["bytes"]["reduce_in_attention_softmax"] > 0
    assert d["predicted_nonconv_ms"] > 0
