"""Image IO: TIF/PNG read + write without MONAI.

The reference reads TIFs with ``tifffile`` (``data/transforms.py:64-77``) or
MONAI ``LoadImage``. This environment ships Pillow and imageio instead; both
read the float32 grayscale TIFs used by the pipeline. Readers return float32
numpy arrays (H, W) or (H, W, C) exactly like ``TifReader``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_image", "write_tif", "write_png", "TifReader"]

try:  # optional, matches the reference's reader when present
    import tifffile as _tifffile
except ImportError:  # pragma: no cover
    _tifffile = None

try:
    import imageio.v3 as _imageio
except ImportError:  # pragma: no cover
    _imageio = None

from PIL import Image


def read_image(path: str) -> np.ndarray:
    """Load an image file as float32 numpy (reference ``TifReader`` contract)."""
    path = str(path)
    if _tifffile is not None and path.lower().endswith((".tif", ".tiff")):
        return _tifffile.imread(path).astype(np.float32)
    if _imageio is not None:
        return np.asarray(_imageio.imread(path)).astype(np.float32)
    return np.asarray(Image.open(path)).astype(np.float32)


class TifReader:
    """Callable reader, API parity with reference ``transforms.py:64-77``."""

    def __call__(self, path: str) -> np.ndarray:
        return read_image(path)


def write_tif(path: str, array: np.ndarray) -> None:
    """Write a float32 TIF (used for validation triplet dumps,
    ``train_vae.py:615-618``, and inference outputs)."""
    array = np.asarray(array, dtype=np.float32)
    if _tifffile is not None:
        _tifffile.imwrite(path, array)
        return
    if array.ndim == 3 and array.shape[-1] == 1:
        array = array[..., 0]
    Image.fromarray(array, mode="F").save(path, format="TIFF")


def write_png(path: str, array: np.ndarray) -> None:
    """Write a uint8 PNG (display-normalized outputs,
    ``inference_vae.py:35-58``)."""
    array = np.asarray(array)
    if array.dtype != np.uint8:
        array = np.clip(array, 0, 255).astype(np.uint8)
    if array.ndim == 3 and array.shape[-1] == 1:
        array = array[..., 0]
    Image.fromarray(array).save(path, format="PNG")
