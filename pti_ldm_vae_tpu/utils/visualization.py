"""Display normalization for logging/dumps.

Reference: ``src/pti_ldm_vae/utils/visualization.py`` — percentile [2, 98]
mask-aware display normalization (background stays black, sub-1e-3 values
suppressed), uint8 normalization, and 2D/3D-slice -> RGB helpers. Host-side
numpy (these feed PNG writers and W&B panels, not the hot loop).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "normalize_batch_for_display",
    "normalize_image_to_uint8",
    "visualize_2d_image",
    "visualize_one_slice_in_3d_image",
]


def normalize_batch_for_display(
    batch: np.ndarray, low: int = 2, high: int = 98
) -> np.ndarray:
    """Percentile display normalization of an NHWC (or NCHW-agnostic 4-D)
    batch to [0, 1]; per-image per-channel stats over non-zero pixels
    (reference ``visualization.py:6-40``). Input is treated as [B, H, W, C]."""
    arr = np.asarray(batch, dtype=np.float32)
    if arr.ndim != 4:
        raise ValueError(f"expected 4-D batch, got {arr.shape}")
    out = np.zeros_like(arr)
    for b in range(arr.shape[0]):
        for c in range(arr.shape[-1]):
            plane = arr[b, :, :, c]
            mask = plane != 0
            if np.any(mask):
                pixels = plane[mask]
                lo = np.percentile(pixels, low)
                hi = np.percentile(pixels, high)
                normed = np.zeros_like(plane)
                normed[mask] = np.clip((pixels - lo) / (hi - lo + 1e-8), 0, 1)
            else:
                normed = np.zeros_like(plane)
            normed[normed < 1e-3] = 0.0  # suppress background noise
            out[b, :, :, c] = normed
    return out


def normalize_image_to_uint8(image: np.ndarray) -> np.ndarray:
    """[min, max] -> uint8 [0, 255] (reference ``visualization.py:43-57``)."""
    draw = np.asarray(image, dtype=np.float32).copy()
    if draw.min() < 0:
        draw -= draw.min()
    if draw.max() > 0.1:
        draw /= draw.max()
    return (255 * draw).astype(np.uint8)


def visualize_2d_image(image: np.ndarray) -> np.ndarray:
    """(H, W) -> RGB uint8 (reference ``visualization.py:60-71``)."""
    draw = normalize_image_to_uint8(np.asarray(image))
    return np.stack([draw, draw, draw], axis=-1)


def visualize_one_slice_in_3d_image(image: np.ndarray, axis: int = 2) -> np.ndarray:
    """Center slice of a 3-D volume -> RGB (reference ``visualization.py:74-101``)."""
    image = np.asarray(image)
    if axis not in (0, 1, 2):
        raise ValueError(f"axis should be in [0, 1, 2], got {axis}")
    center = image.shape[axis] // 2
    slice_img = np.take(image, center, axis=axis)
    return visualize_2d_image(slice_img)
