"""Image resizing ops, TPU-first.

The reference preprocessing resizes every TIF to ``patch_size`` with MONAI's
``Resize`` (default ``mode="area"``; reference ``dataloaders.py:266-274``).
PyTorch's *area* interpolation is adaptive average pooling: output cell ``i``
averages input rows ``[floor(i*In/Out), ceil((i+1)*In/Out))``.

Instead of gather loops, we express that pooling as two small constant
matrices applied along H and W — i.e. two matmuls. On TPU this runs on the
MXU and fuses into the surrounding jitted graph; numerically it matches
``torch.nn.functional.interpolate(mode="area")`` exactly (up to f32 summation
order), in *both* down- and up-scaling (area upscale replicates values, which
the averaging-matrix formulation reproduces).

Also provides ``upsample_nearest_2x`` (decoder upsampling; MONAI AutoencoderKL
decoder uses ``interpolate(scale_factor=2, mode="nearest")`` + conv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["area_resize_matrix", "resize_area", "upsample_nearest_2x"]


@functools.lru_cache(maxsize=128)
def _area_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """Averaging matrix R [out, in]: R @ x == adaptive_avg_pool1d(x, out)."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def area_resize_matrix(in_size: int, out_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Constant [out, in] averaging matrix for area interpolation along one axis."""
    return jnp.asarray(_area_matrix_np(in_size, out_size), dtype=dtype)


def resize_area(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Area-resize NHWC (or HWC / HW) images to ``out_hw``.

    Matches ``torch.nn.functional.interpolate(mode="area")`` /
    MONAI ``Resize(patch_size)`` default semantics (reference
    ``dataloaders.py:270``).
    """
    squeeze_batch = squeeze_chan = False
    if x.ndim == 2:  # HW
        x = x[None, :, :, None]
        squeeze_batch = squeeze_chan = True
    elif x.ndim == 3:  # HWC
        x = x[None]
        squeeze_batch = True
    if x.ndim != 4:
        raise ValueError(f"expected HW/HWC/NHWC input, got shape {x.shape}")

    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    compute_dtype = x.dtype if x.dtype == jnp.float64 else jnp.float32
    out = x.astype(compute_dtype)
    # Preprocessing parity is bit-critical: force f32 MXU precision so TPU
    # does not silently run these matmuls in bf16.
    precision = jax.lax.Precision.HIGHEST
    if h_in != h_out:
        rh = area_resize_matrix(h_in, h_out, compute_dtype)
        out = jnp.einsum("oh,bhwc->bowc", rh, out, precision=precision)
    if w_in != w_out:
        rw = area_resize_matrix(w_in, w_out, compute_dtype)
        out = jnp.einsum("ow,bhwc->bhoc", rw, out, precision=precision)
    out = out.astype(x.dtype)
    if squeeze_chan:
        out = out[..., 0]
    if squeeze_batch:
        out = out[0]
    return out


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsampling on channel-last input of any spatial
    rank, matching ``F.interpolate(scale_factor=2, mode="nearest")`` (MONAI
    decoder upsample).
    """
    spatial = x.shape[1:-1]
    # interleave a broadcast axis of size 2 after every spatial axis
    expand = [x.shape[0]]
    idx = [slice(None)]
    for s in spatial:
        expand += [s, 2]
        idx += [slice(None), None]
    expand.append(x.shape[-1])
    idx.append(slice(None))
    x = jnp.broadcast_to(x[tuple(idx)], tuple(expand))
    return x.reshape(x.shape[0], *(2 * s for s in spatial), expand[-1])
