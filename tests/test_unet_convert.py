"""MONAI-keyed UNet converter: round-trip exactness + key-set contract."""

import jax
import jax.numpy as jnp
import numpy as np

from pti_ldm_vae_tpu.checkpoint.unet_convert import (
    unet_expected_torch_keys,
    unet_from_torch_state_dict,
    unet_to_torch_state_dict,
)
from pti_ldm_vae_tpu.models.unet import DiffusionUNet

CFG = dict(
    spatial_dims=2, in_channels=2, out_channels=2, channels=[8, 16],
    attention_levels=[False, True], num_head_channels=[0, 8],
    num_res_blocks=1, with_conditioning=True, cross_attention_dim=12,
    norm_num_groups=4,
)


def _init_variables():
    unet = DiffusionUNet(
        **{**CFG, "channels": tuple(CFG["channels"]),
           "attention_levels": tuple(CFG["attention_levels"]),
           "num_head_channels": tuple(CFG["num_head_channels"])}
    )
    variables = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 2)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 6, 12)),
    )
    return unet, variables


def test_unet_round_trip_exact():
    unet, variables = _init_variables()
    sd = unet_to_torch_state_dict(variables, CFG)
    back = unet_from_torch_state_dict(sd, CFG)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    b_map = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in b_map, f"missing {key}"
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(b_map[key]), err_msg=key)

    # Converted tree drives the model identically to the original.
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 2)).astype(np.float32))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 12)).astype(np.float32))
    out_a = unet.apply(variables, x, t, ctx)
    out_b = unet.apply(back, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_unet_expected_keys_match_converted_dict():
    _, variables = _init_variables()
    sd = unet_to_torch_state_dict(variables, CFG)
    assert sorted(sd) == sorted(unet_expected_torch_keys(CFG))


def test_unet_converter_accepts_out_proj_spelling():
    """Historical MONAI spelling (out_proj instead of to_out.0) loads too."""
    _, variables = _init_variables()
    sd = unet_to_torch_state_dict(variables, CFG)
    renamed = {k.replace(".to_out.0", ".out_proj"): v for k, v in sd.items()}
    back = unet_from_torch_state_dict(renamed, CFG)
    leaves_a = jax.tree_util.tree_leaves(unet_from_torch_state_dict(sd, CFG))
    leaves_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_converter_rejects_layout_drift():
    import pytest

    _, variables = _init_variables()
    sd = unet_to_torch_state_dict(variables, CFG)
    sd.pop("conv_in.conv.weight")
    with pytest.raises(KeyError, match="layout drift"):
        unet_from_torch_state_dict(sd, CFG)
    sd2 = unet_to_torch_state_dict(variables, CFG)
    sd2["extra.weight"] = np.zeros((1,))
    with pytest.raises(KeyError, match="unconsumed"):
        unet_from_torch_state_dict(sd2, CFG)


def test_canonicalize_torch_key():
    """Drift checks must treat accepted _ALTERNATES spellings as canonical —
    and must not mangle keys that already ARE canonical (substring overlap:
    '.upsampler.conv' is a substring of canonical '.upsampler.conv.conv')."""
    from pti_ldm_vae_tpu.checkpoint.unet_convert import canonicalize_torch_key

    cases = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.out_proj.weight":
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
        "down_blocks.0.downsamplers.0.op.conv.weight":
            "down_blocks.0.downsampler.op.conv.weight",
        "up_blocks.1.upsamplers.0.conv.conv.bias":
            "up_blocks.1.upsampler.conv.conv.bias",
        # already-canonical keys survive unchanged
        "up_blocks.1.upsampler.conv.conv.bias":
            "up_blocks.1.upsampler.conv.conv.bias",
        "conv_in.conv.weight": "conv_in.conv.weight",
    }
    for raw, want in cases.items():
        assert canonicalize_torch_key(raw) == want, raw
