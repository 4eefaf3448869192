"""tools/conv_roofline.py parser: every convolution in a lowered program is
extracted with reconstructible shapes/layouts.

The tool's measurement half needs the TPU tunnel; the parse/reconstruct half
is pure and pinned here: lower a small train step (which contains all three
conv families — forward, input-gradient with lhs dilation, filter-gradient
with batch<->feature swapped dim numbers), parse, and re-execute each unique
spec through lax.conv_general_dilated asserting the recorded output shape.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.conv_roofline import _DTYPES, parse_convs  # noqa: E402

# fast tier excludes this module (lowers/benches real conv programs)
pytestmark = pytest.mark.slow


def _lowered_train_text():
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    config = {
        "spatial_dims": 2, "in_channels": 1, "out_channels": 1,
        "latent_channels": 2, "channels": [4, 8], "num_res_blocks": 1,
        "norm_num_groups": 2, "norm_eps": 1e-6,
        "attention_levels": [False, False],
        "with_encoder_nonlocal_attn": False, "with_decoder_nonlocal_attn": False,
    }
    model = autoencoder_from_config(config)
    images = jnp.zeros((2, 32, 32, 1), jnp.float32)
    params_g = model.init(jax.random.key(0), images[:1], jax.random.key(1))
    state = create_train_state(params_g, lr=1e-4)
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
    lowered = step.lower(state, images, jnp.ones((2,)), {},
                         init_lpips_params(), jax.random.key(2))
    return lowered.as_text()


def test_parse_covers_all_conv_families_and_reconstructs():
    convs = parse_convs(_lowered_train_text())
    assert len(convs) > 30  # fwd VAE+LPIPS + bwd VAE convs

    # all three dim-number families must be present
    def fam(c):
        return tuple(map(tuple, c["dims"]))

    families = {fam(c) for c in convs}
    assert ((0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2)) in families  # forward
    assert any(f[1] == (2, 3, 0, 1) for f in families)  # input gradient
    assert any(f[2] == (2, 3, 0, 1) for f in families)  # filter gradient
    assert any(c["lhs_dilate"] != (1, 1) for c in convs)  # strided-conv grad

    # every parsed spec reconstructs to the recorded output shape
    seen = set()
    for c in convs:
        key = (tuple(c["in"]), tuple(c["kernel"]), fam(c), c["stride"],
               tuple(map(tuple, c["pad"])), c["lhs_dilate"], c["rhs_dilate"])
        if key in seen:
            continue
        seen.add(key)
        x = jnp.zeros(c["in"], _DTYPES[c["dtype"]])
        k = jnp.zeros(c["kernel"], _DTYPES[c["ker_dt"]] if "ker_dt" in c else _DTYPES[c["dtype"]])
        dims = jax.lax.ConvDimensionNumbers(*[tuple(d) for d in c["dims"]])
        out = jax.eval_shape(
            lambda x, k, c=c, dims=dims: jax.lax.conv_general_dilated(
                x, k, window_strides=c["stride"],
                padding=[tuple(p) for p in c["pad"]],
                lhs_dilation=c["lhs_dilate"], rhs_dilation=c["rhs_dilate"],
                dimension_numbers=dims, feature_group_count=c["groups"],
                batch_group_count=c["batch_groups"],
                preferred_element_type=_DTYPES[c["out_dtype"]],
            ),
            x, k,
        )
        assert list(out.shape) == c["out"], (c["in"], c["kernel"], c["out"], out.shape)

    # FLOP accounting: forward 3x3 conv flops = 2*N*H*W*Cout*9*Cin
    fwd = [c for c in convs
           if fam(c) == ((0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2))
           and c["kernel"][0] == 3 and c["stride"] == (1, 1)]
    c = fwd[0]
    n, h, w, _ = c["out"]
    expected = 2.0 * n * h * w * c["kernel"][3] * 9 * c["kernel"][2] / 1e9
    np.testing.assert_allclose(c["gflops"], expected, rtol=1e-6)


def test_scan_body_convs_parse_once():
    """--mode ddim's body multiplier rests on this: a conv inside a
    lax.scan appears ONCE in the lowered text regardless of trip count, so
    main() must scale its count by the trip count (num_inference_steps)."""

    def body(x, _):
        k = jnp.ones((3, 3, 4, 4), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y, None

    fn = jax.jit(lambda x: jax.lax.scan(body, x, None, length=7)[0])
    text = fn.lower(jnp.zeros((2, 8, 8, 4))).as_text()
    convs = parse_convs(text)
    assert len(convs) == 1, [c["in"] for c in convs]
    assert convs[0]["in"] == [2, 8, 8, 4]


def test_roofline_util_null_when_nothing_benched():
    """Zero benched shapes => util is None (null in the JSON), never 0.0;
    bench.py skips null records instead of publishing a fake position."""
    from tools.conv_roofline import _roofline_util

    assert _roofline_util(0.0, 0.05, n_benched=0) is None
    assert _roofline_util(0.04, 0.05, n_benched=3) == pytest.approx(0.8)
