"""spatial_dims=3 support: rank-generic ops + models + converter.

The reference's MONAI classes (AutoencoderKL, DiffusionModelUNet,
PatchDiscriminator) accept ``spatial_dims`` 1/2/3 (reference
``autoencoder.py:48-79`` passes it straight through); the configs ship 2-D
but the class surface is 3-D-capable. These tests pin the TPU build's 3-D
path: op-level parity vs torch (GroupNorm3d / Conv3d / nearest-3D
interpolate), full encode/decode parity vs an independent torch Conv3d
mirror loaded through the MONAI-named converter, and functional checks for
the 3-D UNet and discriminator. Attention parity is rank-independent (it
operates on flattened tokens) and is covered by the 2-D mirror tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from pti_ldm_vae_tpu.checkpoint.torch_convert import (
    from_torch_state_dict,
    to_torch_state_dict,
)
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.models.discriminator import PatchDiscriminator
from pti_ldm_vae_tpu.models.unet import DiffusionUNet
from pti_ldm_vae_tpu.ops.norm import group_norm, instance_norm
from pti_ldm_vae_tpu.ops.resize import upsample_nearest_2x

# fast tier excludes this module (3-D support end-to-end (trace-bound; minutes on 1 core))
pytestmark = pytest.mark.slow

CFG3 = dict(
    spatial_dims=3, in_channels=1, out_channels=1, latent_channels=2,
    channels=[4, 8], num_res_blocks=1, norm_num_groups=2, norm_eps=1e-6,
    attention_levels=[False, False],
    with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
)


def test_group_norm_3d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 6, 7, 8)).astype(np.float32)  # NDHWC
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    ours = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                      num_groups=4, eps=1e-6)
    gn = nn.GroupNorm(4, 8, eps=1e-6)
    gn.weight.data = torch.from_numpy(scale.copy())
    gn.bias.data = torch.from_numpy(bias.copy())
    theirs = gn(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 5, 6, 3)).astype(np.float32)
    ours = instance_norm(jnp.asarray(x))
    theirs = F.instance_norm(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), eps=1e-5
    ).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5)


def test_upsample_nearest_3d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)
    ours = upsample_nearest_2x(jnp.asarray(x))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 4, 1)
    assert ours.shape == (2, 6, 8, 10, 6)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=0, atol=0)


# ------------------- torch Conv3d mirror (attention-free) -------------------
class TRes3(nn.Module):
    def __init__(self, cin, cout, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv3d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv3d(cout, cout, 3, padding=1)
        self.nin_shortcut = nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.nin_shortcut(x) if self.nin_shortcut is not None else x
        return skip + h


class TMirror3(nn.Module):
    """3-D encode/decode matching models/autoencoder_kl.py block-for-block
    (no attention; CFG3)."""

    def __init__(self):
        super().__init__()
        ch, g, eps, lat = CFG3["channels"], CFG3["norm_num_groups"], CFG3["norm_eps"], CFG3["latent_channels"]
        self.enc_conv_in = nn.Conv3d(1, ch[0], 3, padding=1)
        self.enc_res0 = TRes3(ch[0], ch[0], g, eps)
        self.enc_down = nn.Conv3d(ch[0], ch[0], 3, stride=2)
        self.enc_res1 = TRes3(ch[0], ch[1], g, eps)
        self.enc_norm_out = nn.GroupNorm(g, ch[1], eps=eps)
        self.enc_conv_out = nn.Conv3d(ch[1], lat, 3, padding=1)
        self.quant_mu = nn.Conv3d(lat, lat, 1)
        self.quant_logsig = nn.Conv3d(lat, lat, 1)
        self.post_quant = nn.Conv3d(lat, lat, 1)
        self.dec_conv_in = nn.Conv3d(lat, ch[1], 3, padding=1)
        self.dec_res0 = TRes3(ch[1], ch[1], g, eps)
        self.dec_up = nn.Conv3d(ch[1], ch[1], 3, padding=1)
        self.dec_res1 = TRes3(ch[1], ch[0], g, eps)
        self.dec_norm_out = nn.GroupNorm(g, ch[0], eps=eps)
        self.dec_conv_out = nn.Conv3d(ch[0], 1, 3, padding=1)

    def encode(self, x):
        h = self.enc_res0(self.enc_conv_in(x))
        h = self.enc_down(F.pad(h, (0, 1, 0, 1, 0, 1)))
        h = self.enc_res1(h)
        h = self.enc_conv_out(F.silu(self.enc_norm_out(h)))
        mu = self.quant_mu(h)
        logvar = torch.clamp(self.quant_logsig(h), -30.0, 20.0)
        return mu, torch.exp(0.5 * logvar)

    def decode(self, z):
        h = self.dec_conv_in(self.post_quant(z))
        h = self.dec_res0(h)
        h = self.dec_up(F.interpolate(h, scale_factor=2, mode="nearest"))
        h = self.dec_res1(h)
        return self.dec_conv_out(F.silu(self.dec_norm_out(h)))


def _load_mirror3(mirror: TMirror3, variables) -> None:
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(variables, CFG3).items()}

    def put(mod, prefix):
        mod.weight.data = sd.pop(f"{prefix}.weight")
        mod.bias.data = sd.pop(f"{prefix}.bias")

    def res(mod, prefix):
        put(mod.norm1, f"{prefix}.norm1")
        put(mod.conv1, f"{prefix}.conv1.conv")
        put(mod.norm2, f"{prefix}.norm2")
        put(mod.conv2, f"{prefix}.conv2.conv")
        if mod.nin_shortcut is not None:
            put(mod.nin_shortcut, f"{prefix}.nin_shortcut.conv")

    put(mirror.enc_conv_in, "encoder.blocks.0.conv")
    res(mirror.enc_res0, "encoder.blocks.1")
    put(mirror.enc_down, "encoder.blocks.2.conv.conv")
    res(mirror.enc_res1, "encoder.blocks.3")
    put(mirror.enc_norm_out, "encoder.blocks.4")
    put(mirror.enc_conv_out, "encoder.blocks.5.conv")
    put(mirror.quant_mu, "quant_conv_mu.conv")
    put(mirror.quant_logsig, "quant_conv_log_sigma.conv")
    put(mirror.post_quant, "post_quant_conv.conv")
    put(mirror.dec_conv_in, "decoder.blocks.0.conv")
    res(mirror.dec_res0, "decoder.blocks.1")
    put(mirror.dec_up, "decoder.blocks.2.conv.conv")
    res(mirror.dec_res1, "decoder.blocks.3")
    put(mirror.dec_norm_out, "decoder.blocks.4")
    put(mirror.dec_conv_out, "decoder.blocks.5.conv")
    assert not sd, f"unconsumed exported keys: {sorted(sd)}"


def _model3() -> AutoencoderKL:
    return AutoencoderKL(
        spatial_dims=3, in_channels=1, out_channels=1,
        latent_channels=CFG3["latent_channels"], channels=tuple(CFG3["channels"]),
        num_res_blocks=1, norm_num_groups=CFG3["norm_num_groups"],
        attention_levels=(False, False),
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
        use_pallas_attention=False,
    )


def test_autoencoder_3d_matches_torch_mirror():
    model = _model3()
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 8, 8, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x, jax.random.key(1))

    mirror = TMirror3().eval()
    _load_mirror3(mirror, variables)

    mu, sigma = model.apply(variables, x, method=model.encode)
    with torch.no_grad():
        tmu, tsigma = mirror.encode(torch.from_numpy(np.asarray(x)).permute(0, 4, 1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(mu), tmu.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sigma), tsigma.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-5
    )

    recon = model.apply(variables, mu, method=model.decode_stage_2_outputs)
    with torch.no_grad():
        trecon = mirror.decode(tmu)
    np.testing.assert_allclose(
        np.asarray(recon), trecon.permute(0, 2, 3, 4, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_autoencoder_3d_converter_roundtrip():
    model = _model3()
    x = jnp.zeros((1, 8, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, jax.random.key(1))
    sd = to_torch_state_dict(variables, CFG3)
    back = from_torch_state_dict(sd, CFG3)

    def flat(tree):
        return {
            jax.tree_util.keystr(path): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
        }

    a, b = flat(variables), flat(back)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]), err_msg=key)


@pytest.mark.slow
def test_unet_3d_forward_and_grads_finite():
    unet = DiffusionUNet(
        spatial_dims=3, in_channels=2, out_channels=2, channels=(2, 4),
        attention_levels=(False, True), num_head_channels=(0, 2),
        num_res_blocks=1, with_conditioning=True, cross_attention_dim=4,
        norm_num_groups=2,
    )
    x = jnp.ones((1, 4, 4, 4, 2))
    t = jnp.asarray([3], jnp.int32)
    ctx = jnp.ones((1, 3, 4))
    params = unet.init(jax.random.key(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(jnp.square(unet.apply(p, x, t, ctx)))

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_discriminator_3d_patch_output():
    disc = PatchDiscriminator(spatial_dims=3, num_layers_d=2, channels=4)
    x = jnp.ones((2, 16, 16, 16, 1))
    params = disc.init(jax.random.key(0), x)
    feats = disc.apply(params, x)
    assert feats[-1].shape == (2, 2, 2, 2, 1)  # patch logits map
    assert len(feats) == 4


@pytest.mark.slow
def test_lpips_fake3d_matches_manual_slicing():
    """Fake-3D LPIPS == SUM over the three axes of per-axis mean 2-D slice
    distance (MONAI adds loss_sagittal + loss_coronal + loss_axial; all
    slices used, deterministic — documented divergence from MONAI's random
    fake_3d_ratio subsampling)."""
    from pti_ldm_vae_tpu.models.lpips import (
        init_lpips_params,
        lpips_distance_per_sample,
        lpips_distance_per_sample_3d,
    )

    params = init_lpips_params()
    rng = np.random.default_rng(7)
    # slices must be >= 17 px per side (the trunk's pooling floor)
    x = jnp.asarray(rng.standard_normal((1, 17, 18, 19, 1)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 17, 18, 19, 1)).astype(np.float32))
    got = lpips_distance_per_sample_3d(params, x, y)
    assert got.shape == (1,)

    manual = 0.0
    for axis in (1, 2, 3):
        xs = jnp.asarray(np.moveaxis(np.asarray(x), axis, 1)[0])
        ys = jnp.asarray(np.moveaxis(np.asarray(y), axis, 1)[0])
        d = lpips_distance_per_sample(params, xs, ys)
        manual += float(np.mean(np.asarray(d)))
    np.testing.assert_allclose(float(got[0]), manual, rtol=1e-4, atol=1e-5)


def test_train_step_3d_runs():
    """One full jitted VAE train step (L1+KL+fake-3D LPIPS) on NDHWC volumes."""
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    model = _model3()
    x = jnp.asarray(
        np.random.default_rng(8).uniform(0.1, 1.0, (1, 32, 32, 32, 1)).astype(np.float32)
    )
    params_g = model.init(jax.random.key(0), x, jax.random.key(1))
    state = create_train_state(params_g, lr=1e-4)
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
    mask = jnp.ones((1,), jnp.float32)
    new_state, metrics = step(state, x, mask, {}, init_lpips_params(), jax.random.key(2))
    for key, val in metrics.items():
        assert np.isfinite(float(val)), key
    assert int(new_state.step) == 1


def test_regressor_3d_flatten_order_and_shapes():
    """Frozen-3-D-VAE regression: flatten follows torch NCDHW order and the
    eval_shape dim inference matches."""
    from pti_ldm_vae_tpu.models.regressor import (
        VAELatentRegressor,
        flatten_latent,
        infer_flat_dim_from_patch,
    )

    rng = np.random.default_rng(9)
    lat = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)  # B,D,H,W,C
    flat = flatten_latent(jnp.asarray(lat))
    expected = torch.flatten(
        torch.from_numpy(lat).permute(0, 4, 1, 2, 3), start_dim=1
    ).numpy()
    np.testing.assert_array_equal(np.asarray(flat), expected)

    vae = _model3()
    x = jnp.zeros((1, 16, 16, 16, 1))
    vae_vars = vae.init(jax.random.key(0), x, jax.random.key(1))
    flat_dim = infer_flat_dim_from_patch(vae, vae_vars, (16, 16, 16))
    assert flat_dim == 8 * 8 * 8 * CFG3["latent_channels"]

    from pti_ldm_vae_tpu.models.regressor import LatentRegressor

    head = LatentRegressor(hidden_dims=(16,), output_dim=3, activation="relu")
    wrapper = VAELatentRegressor(vae, vae_vars, head, latent_dim=flat_dim)
    head_params = wrapper.init_head(jax.random.key(2))
    out = wrapper.apply(head_params, x)
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_time_resblock_3d_matches_torch():
    """3-D TimeResBlock vs a direct Conv3d mirror loaded from the Flax tree
    (pins the rank-generic conv kernels and the time-embedding broadcast)."""
    from pti_ldm_vae_tpu.models.unet import TimeResBlock

    blk = TimeResBlock(out_channels=6, norm_num_groups=2, norm_eps=1e-6)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 5, 6, 7, 4)).astype(np.float32)
    temb = rng.standard_normal((2, 8)).astype(np.float32)
    params = blk.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(temb))
    out = blk.apply(params, jnp.asarray(x), jnp.asarray(temb))

    p = jax.tree.map(np.asarray, params["params"])

    def conv3(tree):
        k = tree["kernel"]  # (*K, I, O)
        mod = nn.Conv3d(k.shape[3], k.shape[4], k.shape[0],
                        padding=(k.shape[0] - 1) // 2)
        mod.weight.data = torch.from_numpy(
            np.ascontiguousarray(np.transpose(k, (4, 3, 0, 1, 2))))
        mod.bias.data = torch.from_numpy(np.ascontiguousarray(tree["bias"]))
        return mod

    def gn(scale, bias):
        mod = nn.GroupNorm(2, scale.shape[0], eps=1e-6)
        mod.weight.data = torch.from_numpy(np.ascontiguousarray(scale))
        mod.bias.data = torch.from_numpy(np.ascontiguousarray(bias))
        return mod

    lin = nn.Linear(8, 6)
    lin.weight.data = torch.from_numpy(
        np.ascontiguousarray(p["time_emb_proj"]["kernel"].T))
    lin.bias.data = torch.from_numpy(np.ascontiguousarray(p["time_emb_proj"]["bias"]))

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        tt = torch.from_numpy(temb)
        h = conv3(p["conv1"])(F.silu(gn(p["norm1_scale"], p["norm1_bias"])(xt)))
        h = h + lin(F.silu(tt))[:, :, None, None, None]
        h = conv3(p["conv2"])(F.silu(gn(p["norm2_scale"], p["norm2_bias"])(h)))
        expected = conv3(p["skip"])(xt) + h
    np.testing.assert_allclose(
        np.asarray(out), expected.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_unet_spatial_transformer_3d_matches_torch():
    """3-D SpatialTransformer (1x1x1 projections + token-flattened attention
    over D*H*W) vs a torch mirror."""
    import math

    from pti_ldm_vae_tpu.models.unet import SpatialTransformer

    st = SpatialTransformer(num_heads=2, norm_num_groups=2, norm_eps=1e-6,
                            cross_attention_dim=6)
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 3, 4, 5, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 4, 6)).astype(np.float32)
    params = st.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(ctx))
    out = st.apply(params, jnp.asarray(x), jnp.asarray(ctx))

    p = jax.tree.map(np.asarray, params["params"])
    blk = p["block"]

    def lin(tree, bias=True):
        mod = nn.Linear(tree["kernel"].shape[0], tree["kernel"].shape[1], bias=bias)
        mod.weight.data = torch.from_numpy(np.ascontiguousarray(tree["kernel"].T))
        if bias:
            mod.bias.data = torch.from_numpy(np.ascontiguousarray(tree["bias"]))
        return mod

    def ln(tree):
        mod = nn.LayerNorm(8, eps=1e-6)
        mod.weight.data = torch.from_numpy(np.ascontiguousarray(tree["scale"]))
        mod.bias.data = torch.from_numpy(np.ascontiguousarray(tree["bias"]))
        return mod

    def mha(q, k, v, heads=2):
        b, sq, c = q.shape
        hd = c // heads
        qh = q.view(b, sq, heads, hd).transpose(1, 2)
        kh = k.view(b, k.shape[1], heads, hd).transpose(1, 2)
        vh = v.view(b, v.shape[1], heads, hd).transpose(1, 2)
        a = torch.softmax(qh @ kh.transpose(-1, -2) / math.sqrt(hd), dim=-1) @ vh
        return a.transpose(1, 2).reshape(b, sq, c)

    gn = nn.GroupNorm(2, 8, eps=1e-6)
    gn.weight.data = torch.from_numpy(np.ascontiguousarray(p["norm_scale"]))
    gn.bias.data = torch.from_numpy(np.ascontiguousarray(p["norm_bias"]))

    def conv1(tree):
        k = tree["kernel"]  # (1,1,1,I,O)
        mod = nn.Conv3d(k.shape[3], k.shape[4], 1)
        mod.weight.data = torch.from_numpy(
            np.ascontiguousarray(np.transpose(k, (4, 3, 0, 1, 2))))
        mod.bias.data = torch.from_numpy(np.ascontiguousarray(tree["bias"]))
        return mod

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ctxt = torch.from_numpy(ctx)
        b, c = 2, 8
        hidden = conv1(p["proj_in"])(gn(xt))
        hidden = hidden.permute(0, 2, 3, 4, 1).reshape(b, -1, c)
        t = ln(blk["norm1"])(hidden)
        hidden = hidden + lin(blk["attn1_out"])(
            mha(lin(blk["attn1_q"], False)(t), lin(blk["attn1_k"], False)(t),
                lin(blk["attn1_v"], False)(t)))
        t = ln(blk["norm2"])(hidden)
        hidden = hidden + lin(blk["attn2_out"])(
            mha(lin(blk["attn2_q"], False)(t), lin(blk["attn2_k"], False)(ctxt),
                lin(blk["attn2_v"], False)(ctxt)))
        t = ln(blk["norm3"])(hidden)
        gate = lin(blk["ff_in"])(t)
        a, g = gate.chunk(2, dim=-1)
        hidden = hidden + lin(blk["ff_out"])(a * F.gelu(g))
        hidden = hidden.reshape(b, 3, 4, 5, c).permute(0, 4, 1, 2, 3)
        expected = xt + conv1(p["proj_out"])(hidden)
    np.testing.assert_allclose(
        np.asarray(out), expected.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )
