"""LPIPS(squeeze) trunk parity vs a torch mirror (SqueezeNet-1.1 features).

Validates the JAX feature extractor's structure — stride-2 valid conv, fire
modules, MaxPool(3, 2, ceil_mode=True) — and the full LPIPS distance math
against an independent torch implementation carrying the same weights.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from pti_ldm_vae_tpu.models.lpips import (
    _FIRE_CFG,
    _SCALE,
    _SHIFT,
    init_lpips_params,
    lpips_distance,
    lpips_features,
)

# fast tier excludes this module (SqueezeNet trunk parity vs torch (compile-heavy))
pytestmark = pytest.mark.slow


class TorchFire(nn.Module):
    def __init__(self, cin, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, s, 1)
        self.expand1 = nn.Conv2d(s, e1, 1)
        self.expand3 = nn.Conv2d(s, e3, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1(s)), F.relu(self.expand3(s))], dim=1)


class TorchSqueezeTrunk(nn.Module):
    """torchvision squeezenet1_1 `features` with LPIPS tap points."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 64, 3, stride=2)  # no padding
        fires = []
        cin = 64
        for s, e1, e3 in _FIRE_CFG:
            fires.append(TorchFire(cin, s, e1, e3))
            cin = e1 + e3
        self.fires = nn.ModuleList(fires)

    def forward(self, x):
        taps = []
        h = F.relu(self.conv0(x))
        taps.append(h)
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        h = self.fires[1](self.fires[0](h))
        taps.append(h)
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        h = self.fires[3](self.fires[2](h))
        taps.append(h)
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        h = self.fires[4](h)
        taps.append(h)
        h = self.fires[5](h)
        taps.append(h)
        h = self.fires[6](h)
        taps.append(h)
        h = self.fires[7](h)
        taps.append(h)
        return taps


def _load_mirror(params):
    mirror = TorchSqueezeTrunk().eval()

    def set_conv(mod, tree):
        mod.weight.data = torch.from_numpy(
            np.ascontiguousarray(np.transpose(np.asarray(tree["w"]), (3, 2, 0, 1)))
        )
        mod.bias.data = torch.from_numpy(np.asarray(tree["b"]))

    set_conv(mirror.conv0, params["conv0"])
    for i, fire in enumerate(mirror.fires):
        set_conv(fire.squeeze, params[f"fire{i}"]["squeeze"])
        set_conv(fire.expand1, params[f"fire{i}"]["expand1"])
        set_conv(fire.expand3, params[f"fire{i}"]["expand3"])
    return mirror


def test_squeeze_trunk_parity():
    params = init_lpips_params(seed=0)
    mirror = _load_mirror(params)
    rng = np.random.default_rng(0)
    # 67x53: odd sizes exercise ceil_mode padding in every pool
    x = rng.normal(size=(1, 67, 53, 3)).astype(np.float32)
    x_scaled = (x - np.asarray(_SHIFT)) / np.asarray(_SCALE)
    taps_j = lpips_features(params, jnp.asarray(x))
    with torch.no_grad():
        taps_t = mirror(torch.from_numpy(x_scaled).permute(0, 3, 1, 2))
    assert len(taps_j) == len(taps_t) == 7
    for tj, tt in zip(taps_j, taps_t):
        np.testing.assert_allclose(
            np.asarray(tj), tt.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=5e-5
        )


def test_lpips_distance_parity():
    params = init_lpips_params(seed=0)
    mirror = _load_mirror(params)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    b = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    ours = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))

    def torch_lpips(x, y):
        def prep(v):
            v3 = np.repeat(v, 3, axis=-1)
            v3 = (v3 - np.asarray(_SHIFT)) / np.asarray(_SCALE)
            return torch.from_numpy(v3).permute(0, 3, 1, 2)

        with torch.no_grad():
            fx = mirror(prep(x))
            fy = mirror(prep(y))
        total = torch.zeros(x.shape[0])
        for i, (fa, fb) in enumerate(zip(fx, fy)):
            na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            w = torch.from_numpy(np.asarray(params[f"lin{i}"]["w"]))
            total = total + ((na - nb).pow(2) * w[None, :, None, None]).sum(1).mean((1, 2))
        return float(total.mean())

    theirs = torch_lpips(a, b)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_lpips_bf16_trunk_close_to_f32():
    """The mixed-precision trunk path (train-step policy on TPU) tracks the
    f32 distance within bf16 rounding."""
    from pti_ldm_vae_tpu.models.lpips import lpips_distance_per_sample

    params = init_lpips_params(seed=0)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    d32 = np.asarray(lpips_distance_per_sample(params, a, b, jnp.float32))
    d16 = np.asarray(lpips_distance_per_sample(params, a, b, jnp.bfloat16))
    assert d16.dtype == np.float32  # accumulation stays f32
    np.testing.assert_allclose(d16, d32, rtol=0.05, atol=1e-3)
