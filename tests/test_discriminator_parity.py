"""PatchDiscriminator numeric parity vs an independent torch mirror."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from pti_ldm_vae_tpu.models.discriminator import PatchDiscriminator


class TorchPatchDisc(nn.Module):
    """Mirror of models/discriminator.py (pix2pix 70x70 PatchGAN, NCHW)."""

    def __init__(self, channels=8, num_layers_d=2, in_ch=1, out_ch=1):
        super().__init__()
        self.conv0 = nn.Conv2d(in_ch, channels, 4, stride=2, padding=1)
        mids = []
        ch = channels
        for _ in range(1, num_layers_d):
            mids.append(nn.Conv2d(ch, ch * 2, 4, stride=2, padding=1, bias=False))
            ch *= 2
        self.mids = nn.ModuleList(mids)
        self.penult = nn.Conv2d(ch, ch * 2, 4, stride=1, padding=1, bias=False)
        ch *= 2
        self.final = nn.Conv2d(ch, out_ch, 4, stride=1, padding=1)

    def forward(self, x):
        feats = []
        h = F.leaky_relu(self.conv0(x), 0.2)
        feats.append(h)
        for mid in self.mids:
            h = F.leaky_relu(F.instance_norm(mid(h)), 0.2)
            feats.append(h)
        h = F.leaky_relu(F.instance_norm(self.penult(h)), 0.2)
        feats.append(h)
        feats.append(self.final(h))
        return feats


def test_disc_monai_checkpoint_roundtrip():
    """A reference-format discriminator state dict (MONAI 1.5.1 key names,
    ``docs/MONAI_NOTES.md`` §3) loads through the converter and reproduces the
    torch mirror's logits at the reference's exact config
    (``train_vae.py:266-275``: num_layers_d=3, channels=32)."""
    from pti_ldm_vae_tpu.checkpoint.torch_convert import (
        disc_from_torch_state_dict,
        disc_to_torch_state_dict,
    )

    torch.manual_seed(0)
    mirror = TorchPatchDisc(channels=32, num_layers_d=3).eval()
    # Build the state dict exactly as MONAI PatchDiscriminator names it:
    # Sequential children initial_conv / "0" / "1" / "2" / final_conv, each a
    # Convolution wrapper contributing a ".conv" segment.
    sd = {
        "initial_conv.conv.weight": mirror.conv0.weight.detach().numpy(),
        "initial_conv.conv.bias": mirror.conv0.bias.detach().numpy(),
        "0.conv.weight": mirror.mids[0].weight.detach().numpy(),
        "1.conv.weight": mirror.mids[1].weight.detach().numpy(),
        "2.conv.weight": mirror.penult.weight.detach().numpy(),
        "final_conv.conv.weight": mirror.final.weight.detach().numpy(),
        "final_conv.conv.bias": mirror.final.bias.detach().numpy(),
    }
    variables = disc_from_torch_state_dict({"discriminator_state_dict": sd})

    disc = PatchDiscriminator(channels=32, num_layers_d=3)
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 1)).astype(np.float32)
    feats_j = disc.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        feats_t = mirror(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(feats_j[-1]),
        feats_t[-1].permute(0, 2, 3, 1).numpy(),
        rtol=1e-4,
        atol=1e-5,
    )

    # Export round-trip reproduces the torch tensors bit-for-bit.
    back = disc_to_torch_state_dict(variables)
    assert sorted(back) == sorted(sd)
    for key, val in sd.items():
        np.testing.assert_array_equal(back[key], val)


def test_disc_converter_rejects_layout_drift():
    from pti_ldm_vae_tpu.checkpoint.torch_convert import disc_from_torch_state_dict

    import pytest

    with pytest.raises(KeyError, match="layout drift"):
        disc_from_torch_state_dict({"wrong.conv.weight": np.zeros((32, 1, 4, 4))})


def test_discriminator_matches_torch_mirror():
    disc = PatchDiscriminator(channels=8, num_layers_d=2)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 1)).astype(np.float32)
    params = disc.init(jax.random.key(0), jnp.asarray(x))

    mirror = TorchPatchDisc().eval()
    p = params["params"]

    def set_conv(mod, tree, bias=True):
        mod.weight.data = torch.from_numpy(
            np.ascontiguousarray(np.transpose(np.asarray(tree["kernel"]), (3, 2, 0, 1)))
        )
        if bias:
            mod.bias.data = torch.from_numpy(np.asarray(tree["bias"]))

    set_conv(mirror.conv0, p["conv_0"])
    set_conv(mirror.mids[0], p["conv_1"], bias=False)
    set_conv(mirror.penult, p["conv_penultimate"], bias=False)
    set_conv(mirror.final, p["conv_final"])

    feats_j = disc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        feats_t = mirror(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(feats_j) == len(feats_t)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )
