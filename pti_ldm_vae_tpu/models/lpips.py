"""LPIPS perceptual loss with a SqueezeNet-1.1 backbone — JAX/NHWC.

Equivalent of MONAI ``PerceptualLoss(spatial_dims=2, network_type="squeeze")``
(reference ``train_vae.py:299``, ``evaluate_vae.py:150``), which wraps the
``lpips`` package's SqueezeNet variant. Structure reproduced here:

* input scaling layer: ``(x - shift) / scale`` with the published LPIPS
  constants (inputs expected in [-1, 1]),
* SqueezeNet-1.1 ``features`` trunk with taps after each of the 7 LPIPS
  slices (channel widths 64/128/256/384/384/512/512),
* per-tap: channel-unit-normalize both inputs, squared difference, learned
  1x1 "lin" weights, spatial mean, summed over taps, mean over batch.

Pretrained torchvision/lpips weights are not shipped in this environment
(zero egress); ``load_lpips_params`` loads a converted ``.npz`` when
available (see ``checkpoint/torch_convert.py``), otherwise
``init_lpips_params`` produces a deterministic random-feature perceptual
metric (documented divergence — still a useful training signal, but not
LPIPS-calibrated; parity runs must supply converted weights).

The reference feeds single-channel images repeated to 3 channels
(``utils/losses.py:8-28``); use :func:`ensure_three_channels`.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ensure_three_channels",
    "init_lpips_params",
    "load_lpips_params",
    "lpips_is_pretrained",
    "lpips_features",
    "lpips_distance",
    "lpips_distance_per_sample",
    "lpips_distance_per_sample_3d",
]

logger = logging.getLogger(__name__)

# LPIPS published scaling constants (RGB).
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# SqueezeNet-1.1 `features` trunk, annotated with LPIPS slice boundaries.
# Each fire block: squeeze 1x1 -> relu -> (expand 1x1 | expand 3x3 pad 1) -> relu -> concat.
_FIRE_CFG = [  # (squeeze, expand1x1, expand3x3) with input channels implied
    (16, 64, 64),   # fire at idx 3  (in 64)
    (16, 64, 64),   # fire at idx 4  (in 128)
    (32, 128, 128),  # fire at idx 6 (in 128)
    (32, 128, 128),  # fire at idx 7 (in 256)
    (48, 192, 192),  # fire at idx 9 (in 256)
    (48, 192, 192),  # fire at idx 10 (in 384)
    (64, 256, 256),  # fire at idx 11 (in 384)
    (64, 256, 256),  # fire at idx 12 (in 512)
]
LPIPS_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


# The canonical definition lives at the reference's module location
# (utils/losses.py); re-exported here because it is LPIPS's input contract.
from ..utils.losses import ensure_three_channels  # noqa: E402


def _conv_shape_params(rng, in_ch: int, out_ch: int, k: int):
    kkey, _ = jax.random.split(rng)
    fan_in = in_ch * k * k
    w = jax.random.normal(kkey, (k, k, in_ch, out_ch), dtype=jnp.float32)
    w = w * np.sqrt(2.0 / fan_in)
    b = jnp.zeros((out_ch,), dtype=jnp.float32)
    return {"w": w, "b": b}


def init_lpips_params(seed: int = 0) -> dict[str, Any]:
    """Deterministic random-init LPIPS parameter tree (fallback when no
    converted pretrained weights are available)."""
    rng = jax.random.key(seed)
    keys = jax.random.split(rng, 2 + len(_FIRE_CFG) * 3 + len(LPIPS_CHANNELS))
    ki = iter(range(len(keys)))
    params: dict[str, Any] = {}
    params["conv0"] = _conv_shape_params(keys[next(ki)], 3, 64, 3)
    in_ch = 64
    for i, (s, e1, e3) in enumerate(_FIRE_CFG):
        params[f"fire{i}"] = {
            "squeeze": _conv_shape_params(keys[next(ki)], in_ch, s, 1),
            "expand1": _conv_shape_params(keys[next(ki)], s, e1, 1),
            "expand3": _conv_shape_params(keys[next(ki)], s, e3, 3),
        }
        in_ch = e1 + e3
    for i, c in enumerate(LPIPS_CHANNELS):
        # lpips "lin" layers: 1x1 conv, no bias, non-negative weights.
        w = jax.random.uniform(keys[next(ki)], (c,), dtype=jnp.float32, minval=0.0, maxval=2.0 / c)
        params[f"lin{i}"] = {"w": w}
    params["_pretrained"] = jnp.zeros((), dtype=jnp.float32)  # 0 = random init
    return params


def load_lpips_params(npz_path: str | None = None, seed: int = 0) -> dict[str, Any]:
    """Load converted LPIPS weights from ``.npz`` (keys ``conv0/w`` etc.),
    falling back to :func:`init_lpips_params`.

    Search order: explicit path -> $PTI_LPIPS_WEIGHTS -> packaged default
    (``weights/lpips_squeeze.npz``). Setting ``$PTI_LPIPS_WEIGHTS=none``
    skips every candidate and forces the random-init fallback (used by the
    test suite so packaged weights don't change test behavior).
    """
    env = os.environ.get("PTI_LPIPS_WEIGHTS")
    if env == "none":  # explicit opt-out: ignore env AND the packaged default
        candidates = [npz_path]
    else:
        candidates = [
            npz_path,
            env,
            os.path.join(os.path.dirname(__file__), "..", "..", "weights", "lpips_squeeze.npz"),
        ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            raw = np.load(cand)
            params: dict[str, Any] = {}
            for key in raw.files:
                parts = key.split("/")
                node = params
                for part in parts[:-1]:
                    node = node.setdefault(part, {})
                node[parts[-1]] = jnp.asarray(raw[key])
            params["_pretrained"] = jnp.ones((), dtype=jnp.float32)
            logger.info("LPIPS: loaded pretrained squeeze weights from %s", cand)
            return params
    # LOUD fallback: training against random features is a well-defined but
    # NOT LPIPS-calibrated perceptual objective; parity runs vs the torch
    # reference are invalid without converted weights.
    logger.warning(
        "LPIPS: no pretrained weights found (looked at %s); falling back to "
        "DETERMINISTIC RANDOM features. The perceptual loss is still a usable "
        "training signal but is NOT LPIPS — for reference parity convert real "
        "weights with tools/convert_lpips_weights.py and set "
        "$PTI_LPIPS_WEIGHTS or place weights/lpips_squeeze.npz.",
        [c for c in candidates if c],
    )
    return init_lpips_params(seed)


def lpips_is_pretrained(params: dict[str, Any]) -> bool:
    """True when ``params`` carry converted pretrained weights (the
    ``_pretrained`` flag written by :func:`load_lpips_params`)."""
    flag = params.get("_pretrained")
    return bool(flag is not None and float(flag) == 1.0)


def _conv(x, p, stride=1, padding=0):
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    pad = [(padding, padding), (padding, padding)]
    out = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (stride, stride), pad,
                                       dimension_numbers=dn)
    return out + p["b"].astype(x.dtype)


def _maxpool_ceil(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    """MaxPool(kernel 3, stride 2, ceil_mode=True) like torchvision SqueezeNet."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    pad_h = max(0, (out_h - 1) * s + k - h)
    pad_w = max(0, (out_w - 1) * s + k - w)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)],
    )


def _fire(x, p):
    s = jax.nn.relu(_conv(x, p["squeeze"]))
    e1 = jax.nn.relu(_conv(s, p["expand1"]))
    e3 = jax.nn.relu(_conv(s, p["expand3"], padding=1))
    return jnp.concatenate([e1, e3], axis=-1)


def lpips_features(
    params: dict[str, Any], x: jnp.ndarray, compute_dtype: Any = jnp.float32
) -> list[jnp.ndarray]:
    """The 7 LPIPS tap activations for an NHWC 3-channel input in [-1, 1].

    ``compute_dtype`` runs the SqueezeNet trunk at that precision (bf16 on
    TPU inside the mixed-precision train step — same policy as the VAE conv
    stack); the distance accumulation downstream stays f32 either way.
    """
    x = ((x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)).astype(compute_dtype)
    taps = []
    h = jax.nn.relu(_conv(x, params["conv0"], stride=2))          # relu1
    taps.append(h)
    h = _maxpool_ceil(h)
    h = _fire(h, params["fire0"])
    h = _fire(h, params["fire1"])                                  # relu2
    taps.append(h)
    h = _maxpool_ceil(h)
    h = _fire(h, params["fire2"])
    h = _fire(h, params["fire3"])                                  # relu3
    taps.append(h)
    h = _maxpool_ceil(h)
    h = _fire(h, params["fire4"])                                  # relu4
    taps.append(h)
    h = _fire(h, params["fire5"])                                  # relu5
    taps.append(h)
    h = _fire(h, params["fire6"])                                  # relu6
    taps.append(h)
    h = _fire(h, params["fire7"])                                  # relu7
    taps.append(h)
    return taps


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance_per_sample(
    params: dict[str, Any], x: jnp.ndarray, y: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Per-sample [B] LPIPS distances (for masked batch means)."""
    if min(x.shape[1], x.shape[2]) < 17:
        # Below 17 px the trunk's third ceil-mode maxpool produces a
        # zero-size map (torch LPIPS errors identically: "Output size is
        # too small"); fail loudly instead of returning NaN.
        raise ValueError(
            f"LPIPS SqueezeNet trunk needs inputs >= 17 px per side, got "
            f"{x.shape[1]}x{x.shape[2]}"
        )
    x = ensure_three_channels(x.astype(jnp.float32))
    y = ensure_three_channels(y.astype(jnp.float32))
    fx = lpips_features(params, x, compute_dtype)
    fy = lpips_features(params, y, compute_dtype)
    total = jnp.zeros((x.shape[0],), dtype=jnp.float32)
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        w = params[f"lin{i}"]["w"].astype(jnp.float32)  # [C]
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
    return total


def lpips_distance(params: dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Scalar LPIPS distance, mean over batch (MONAI PerceptualLoss contract).

    Inputs: NHWC, 1 or 3 channels, any real range (the caller decides
    normalization; the reference feeds z-scored images as-is).
    """
    return jnp.mean(lpips_distance_per_sample(params, x, y))


def lpips_distance_per_sample_3d(
    params: dict[str, Any], x: jnp.ndarray, y: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """Per-sample [B] "fake-3D" LPIPS for NDHWC volumes.

    The 2-D backbone is applied to every axis-aligned slice and averaged —
    the approach of MONAI ``PerceptualLoss(spatial_dims=3, is_fake_3d=True)``
    (the reference only ever constructs the 2-D loss, ``train_vae.py:299``;
    this is the 3-D extension of the same contract). Divergence from MONAI,
    documented: MONAI subsamples a random ``fake_3d_ratio`` of slices each
    call; here ALL slices are used, which is deterministic and keeps the
    jitted step shape-static. Loss = SUM over the three slicing axes of the
    per-axis mean slice distance (MONAI adds loss_sagittal + loss_coronal +
    loss_axial — the axes are summed, not averaged, so ``perceptual_weight``
    means the same thing in both frameworks).
    """
    if x.ndim != 5:
        raise ValueError(f"expected NDHWC volume, got shape {x.shape}")
    b = x.shape[0]
    total = jnp.zeros((b,), jnp.float32)
    for axis in (1, 2, 3):
        # move the slicing axis next to batch, fold it in, run 2-D LPIPS
        xs = jnp.moveaxis(x, axis, 1)
        ys = jnp.moveaxis(y, axis, 1)
        n = xs.shape[1]
        xs = xs.reshape(b * n, *xs.shape[2:])
        ys = ys.reshape(b * n, *ys.shape[2:])
        per_slice = lpips_distance_per_sample(params, xs, ys, compute_dtype)
        total = total + jnp.mean(per_slice.reshape(b, n), axis=1)
    return total
