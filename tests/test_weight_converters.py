"""End-to-end coverage for the pretrained-weight converters (VERDICT item 2).

Builds torch-format state dicts in-test (exact torchvision/lpips key names),
runs the converters, loads the npz through the framework's loaders, and
asserts distances/features match an independent torch computation that reads
the ORIGINAL state dicts directly — so a key-mapping or transpose bug in the
converter cannot cancel out.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pti_ldm_vae_tpu.models.lpips import (
    _FIRE_CFG,
    load_lpips_params,
    lpips_distance,
    lpips_is_pretrained,
)
from test_lpips_parity import TorchSqueezeTrunk
from tools.convert_lpips_weights import FIRE_INDICES, convert_state_dicts
from tools.convert_vgg16_weights import VGG16_CONV_INDICES, convert_features_state_dict

LPIPS_TAP_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


def _rand_conv(rng, out_ch, in_ch, k):
    return (
        rng.normal(0, 0.05, size=(out_ch, in_ch, k, k)).astype(np.float32),
        rng.normal(0, 0.05, size=(out_ch,)).astype(np.float32),
    )


def _make_squeeze_features_sd(rng):
    """torchvision squeezenet1_1 ``features`` state dict (torch OIHW keys)."""
    sd = {}
    w, b = _rand_conv(rng, 64, 3, 3)
    sd["0.weight"], sd["0.bias"] = w, b
    in_ch = 64
    for idx, (s, e1, e3) in zip(FIRE_INDICES, _FIRE_CFG):
        for name, (o, i, k) in {
            "squeeze": (s, in_ch, 1),
            "expand1x1": (e1, s, 1),
            "expand3x3": (e3, s, 3),
        }.items():
            w, b = _rand_conv(rng, o, i, k)
            sd[f"{idx}.{name}.weight"], sd[f"{idx}.{name}.bias"] = w, b
        in_ch = e1 + e3
    return sd


def test_lpips_converter_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    features_sd = _make_squeeze_features_sd(rng)
    lins_sd = {
        f"lin{i}.model.1.weight": rng.uniform(0, 0.1, size=(1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(LPIPS_TAP_CHANNELS)
    }

    out = convert_state_dicts(features_sd, lins_sd)
    npz = tmp_path / "lpips_squeeze.npz"
    np.savez(npz, **out)
    monkeypatch.setenv("PTI_LPIPS_WEIGHTS", str(npz))
    params = load_lpips_params()
    assert lpips_is_pretrained(params)

    a = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    b = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    ours = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))

    # Independent torch computation straight from the ORIGINAL state dicts.
    mirror = TorchSqueezeTrunk().eval()
    mirror.conv0.weight.data = torch.from_numpy(features_sd["0.weight"])
    mirror.conv0.bias.data = torch.from_numpy(features_sd["0.bias"])
    for i, idx in enumerate(FIRE_INDICES):
        fire = mirror.fires[i]
        for tname, mod in {"squeeze": fire.squeeze, "expand1x1": fire.expand1,
                           "expand3x3": fire.expand3}.items():
            mod.weight.data = torch.from_numpy(features_sd[f"{idx}.{tname}.weight"])
            mod.bias.data = torch.from_numpy(features_sd[f"{idx}.{tname}.bias"])

    from pti_ldm_vae_tpu.models.lpips import _SCALE, _SHIFT

    def prep(v):
        v3 = np.repeat(v, 3, axis=-1)
        v3 = (v3 - np.asarray(_SHIFT)) / np.asarray(_SCALE)
        return torch.from_numpy(v3).permute(0, 3, 1, 2)

    with torch.no_grad():
        fx, fy = mirror(prep(a)), mirror(prep(b))
    total = torch.zeros(2)
    for i, (fa, fb) in enumerate(zip(fx, fy)):
        na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        w = torch.from_numpy(lins_sd[f"lin{i}.model.1.weight"].reshape(-1))
        total = total + ((na - nb).pow(2) * w[None, :, None, None]).sum(1).mean((1, 2))
    theirs = float(total.mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_lpips_converter_accepts_modulelist_keys():
    rng = np.random.default_rng(1)
    features_sd = _make_squeeze_features_sd(rng)
    lins_a = {
        f"lin{i}.model.1.weight": rng.uniform(0, 0.1, size=(1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(LPIPS_TAP_CHANNELS)
    }
    lins_b = {f"lins.{i}.model.1.weight": lins_a[f"lin{i}.model.1.weight"] for i in range(7)}
    out_a = convert_state_dicts(features_sd, lins_a)
    out_b = convert_state_dicts(features_sd, lins_b)
    for key in out_a:
        np.testing.assert_array_equal(out_a[key], out_b[key])


def test_lpips_converter_missing_lin_raises():
    rng = np.random.default_rng(2)
    features_sd = _make_squeeze_features_sd(rng)
    with pytest.raises(KeyError, match="no lin weight"):
        convert_state_dicts(features_sd, {})


def test_lpips_fallback_is_loud(monkeypatch, caplog):
    # "none" opts out of env AND packaged weights/ defaults, so this test is
    # stable even after a user installs converted weights.
    monkeypatch.setenv("PTI_LPIPS_WEIGHTS", "none")
    import logging

    with caplog.at_level(logging.WARNING, logger="pti_ldm_vae_tpu.models.lpips"):
        params = load_lpips_params()
    assert not lpips_is_pretrained(params)
    assert any("RANDOM" in rec.message for rec in caplog.records)


def test_vgg16_converter_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    # torchvision vgg16().features state dict
    sd = {}
    in_ch = 3
    channels = [c for c in cfg if c != "M"]
    for idx, out_ch in zip(VGG16_CONV_INDICES, channels):
        w, b = _rand_conv(rng, out_ch, in_ch, 3)
        sd[f"{idx}.weight"], sd[f"{idx}.bias"] = w, b
        in_ch = out_ch

    out = convert_features_state_dict(sd)
    npz = tmp_path / "vgg16_features.npz"
    np.savez(npz, **out)
    monkeypatch.setenv("PTI_VGG16_WEIGHTS", str(npz))

    from pti_ldm_vae_tpu.analysis.metrics import vgg16_features_fn

    feats = vgg16_features_fn()
    x = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    ours = np.asarray(feats(jnp.asarray(x[None])))

    # Independent torch forward from the ORIGINAL state dict.
    layers = []
    conv_i = 0
    for item in cfg:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            conv = torch.nn.Conv2d(3 if conv_i == 0 else channels[conv_i - 1], item, 3, padding=1)
            conv.weight.data = torch.from_numpy(sd[f"{VGG16_CONV_INDICES[conv_i]}.weight"])
            conv.bias.data = torch.from_numpy(sd[f"{VGG16_CONV_INDICES[conv_i]}.bias"])
            layers.extend([conv, torch.nn.ReLU()])
            conv_i += 1
    features = torch.nn.Sequential(*layers).eval()
    with torch.no_grad():
        theirs = features(torch.from_numpy(x[None]).permute(0, 3, 1, 2)).reshape(-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
