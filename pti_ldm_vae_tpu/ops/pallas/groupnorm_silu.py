"""Fused GroupNorm + SiLU Pallas TPU kernel.

The VAE hot loop is a chain of [GroupNorm -> SiLU -> Conv] blocks; this kernel
computes the norm statistics and the normalized+activated output in a single
VMEM-resident pass per image (grid over batch). Math matches
``ops.norm.group_norm_silu`` (f32 statistics, biased variance, torch GroupNorm
semantics), with the elementwise normalize running in the input dtype (bf16 on
TPU) so no f32 copy of the activation is materialized.

Mosaic-friendly structure: everything stays 2-D — channel->group reduction and
the group->channel broadcast are expressed as tiny matmuls against a constant
one-hot [C, G] map (runs on the MXU; no lane-dim reshapes, no 1-D iota).

Backward: ``jax.custom_vjp`` recomputing through the XLA reference formulation
(rematerialization — the standard TPU memory/FLOPs trade).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["groupnorm_silu_pallas"]


@functools.lru_cache(maxsize=32)
def _group_map_np(channels: int, num_groups: int) -> np.ndarray:
    """One-hot [C, G] map: column g selects the channels of group g."""
    cg = channels // num_groups
    mat = np.zeros((channels, num_groups), dtype=np.float32)
    for g in range(num_groups):
        mat[g * cg : (g + 1) * cg, g] = 1.0
    return mat


def _kernel(x_ref, scale_ref, bias_ref, gmap_ref, out_ref,
            *, eps: float, count: int, chunk: int):
    """Two chunked passes over [HW, C]: f32 temporaries never exceed one
    ``chunk`` of rows, so VMEM stays bounded regardless of image size."""
    hw, c = x_ref.shape
    num_chunks = hw // chunk
    dtype = x_ref.dtype

    def stats_body(i, carry):
        s, ss = carry
        blk = x_ref[pl.ds(pl.multiple_of(i * chunk, chunk), chunk), :].astype(jnp.float32)
        return s + jnp.sum(blk, axis=0, keepdims=True), ss + jnp.sum(blk * blk, axis=0, keepdims=True)

    zeros = jnp.zeros((1, c), jnp.float32)
    sum_c, sumsq_c = jax.lax.fori_loop(0, num_chunks, stats_body, (zeros, zeros))

    gmap = gmap_ref[:]  # [C, G]
    gsum = jnp.dot(sum_c, gmap, preferred_element_type=jnp.float32)     # [1, G]
    gsumsq = jnp.dot(sumsq_c, gmap, preferred_element_type=jnp.float32)
    mean_g = gsum / count
    var_g = gsumsq / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jnp.dot(mean_g, gmap.T, preferred_element_type=jnp.float32)  # [1, C]
    inv_c = jnp.dot(inv_g, gmap.T, preferred_element_type=jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)  # [1, C]
    bias = bias_ref[:].astype(jnp.float32)
    # Fold (x - mean) * inv * scale + bias into one multiply-add per element.
    mul = (inv_c * scale).astype(dtype)
    add = (bias - mean_c * inv_c * scale).astype(dtype)
    one = jnp.asarray(1.0, dtype)

    def apply_body(i, _):
        idx = pl.ds(pl.multiple_of(i * chunk, chunk), chunk)
        y = x_ref[idx, :] * mul + add
        # Mosaic miscompiles bf16 logistic (f32 constant broadcast); exp in
        # the input dtype keeps element types consistent.
        out_ref[idx, :] = y / (jnp.exp(-y) + one)
        return 0

    jax.lax.fori_loop(0, num_chunks, apply_body, 0)


def _forward(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
             num_groups: int, eps: float) -> jnp.ndarray:
    b, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    hw = h * w
    count = hw * (c // num_groups)
    chunk = hw
    while chunk > 2048:  # largest power-of-two-ish divisor of hw <= 2048 rows
        if chunk % 2:
            break
        chunk //= 2
    kernel = functools.partial(_kernel, eps=eps, count=count, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
    )(
        x.reshape(b, hw, c),
        scale.reshape(1, c),
        bias.reshape(1, c),
        jnp.asarray(_group_map_np(c, num_groups)),
    )
    return out.reshape(b, h, w, c)


def _xla_reference(x, scale, bias, num_groups, eps):
    from ..norm import group_norm

    y = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
    # Same dtype discipline as the kernel: activation math in input dtype.
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def groupnorm_silu_pallas(x, scale, bias, num_groups: int, eps: float = 1e-6):
    """silu(group_norm(x, scale, bias)) on NHWC via a fused Pallas kernel."""
    return _forward(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    return _forward(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda xx, ss, bb: _xla_reference(xx, ss, bb, num_groups, eps),
                     x, scale, bias)
    return vjp(g)


groupnorm_silu_pallas.defvjp(_fwd, _bwd)
