"""Batch PSNR and SSIM — jnp, NHWC, numerically matching the reference.

Reference: ``src/pti_ldm_vae/utils/eval_metrics.py:6-63`` — PSNR with an MSE
floor of 1e-12; SSIM from scratch with an 11x11 Gaussian window (sigma=1.5),
zero-padded depthwise convolution (torch conv2d padding=5), K1=0.01, K2=0.03.
The Gaussian filter here is applied as two separable 1-D depthwise convs (the
2-D window is an outer product), which XLA maps better onto TPU; zero padding
semantics are identical so results match the reference bit-for-bit in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_psnr", "compute_ssim", "compute_mse", "compute_mae"]


def compute_psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR per sample over NHWC batches (reference ``eval_metrics.py:6-19``)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(pred - target), axis=tuple(range(1, pred.ndim)))
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(data_range**2 / mse)


def compute_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)),
                    axis=tuple(range(1, pred.ndim)))


def compute_mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)),
                    axis=tuple(range(1, pred.ndim)))


@functools.lru_cache(maxsize=4)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(coords**2) / (2 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable zero-padded Gaussian blur on NHWC."""
    c = x.shape[-1]
    g = jnp.asarray(_gaussian_1d(window_size, sigma))
    kh = jnp.tile(g.reshape(window_size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I/groups=1
    kw = jnp.tile(g.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    pad = window_size // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn, feature_group_count=c
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn, feature_group_count=c
    )


def compute_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM per sample, NHWC, matching reference ``eval_metrics.py:22-63``.

    5-D (NDHWC) volumes are scored as the per-sample mean of 2-D SSIM over
    DEPTH slices only. This is a documented divergence (docs/PARITY.md): it
    is neither MONAI's true 3-D windowed SSIM nor the fake-3D perceptual
    path's all-three-axes sum — 3-D SSIM values are comparable between runs
    of this framework but not to MONAI ``spatial_dims=3`` SSIM."""
    if pred.ndim == 5:
        b, d = pred.shape[0], pred.shape[1]
        per_slice = compute_ssim(
            pred.reshape(b * d, *pred.shape[2:]),
            target.reshape(b * d, *target.shape[2:]),
            data_range=data_range, k1=k1, k2=k2,
        )
        return jnp.mean(per_slice.reshape(b, d), axis=1)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    window_size, sigma = 11, 1.5
    blur = functools.partial(_depthwise_blur, window_size=window_size, sigma=sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = blur(pred)
    mu_y = blur(target)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x2 = blur(pred * pred) - mu_x2
    sigma_y2 = blur(target * target) - mu_y2
    sigma_xy = blur(pred * target) - mu_xy

    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))
