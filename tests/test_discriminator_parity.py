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
