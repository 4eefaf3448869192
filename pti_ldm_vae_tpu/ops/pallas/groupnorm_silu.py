"""Fused GroupNorm + SiLU Pallas TPU kernels (forward AND backward).

The VAE hot loop is a chain of [GroupNorm -> SiLU -> Conv] blocks; the forward
kernel computes the norm statistics and the normalized+activated output in a
single VMEM-resident pass per image (grid over batch). Math matches
``ops.norm.group_norm_silu`` (f32 statistics, biased variance, torch GroupNorm
semantics), with the elementwise normalize running in the input dtype (bf16 on
TPU) so no f32 copy of the activation is materialized.

Mosaic-friendly structure: everything stays 2-D — channel->group reduction and
the group->channel broadcast are expressed as tiny matmuls against a constant
one-hot [C, G] map (runs on the MXU; no lane-dim reshapes, no 1-D iota).

Backward (the train step runs two of these chains per ResBlock): the forward
saves the per-group statistics as residuals, so the backward needs no stats
recompute — two row-blocked Pallas passes:

1. reduce: per-batch channel sums ``r1 = sum(dn)`` and ``r2 = sum(dn*xhat)``
   (dn = upstream grad through the SiLU derivative), accumulated across the
   row-block grid axis (sequential on a TPU core);
2. dx: ``inv * (dn*gamma - A_g/m - xhat * B_g/m)`` with the group terms
   ``A_g = sum_g(gamma*r1)``, ``B_g = sum_g(gamma*r2)`` folded per-batch in
   XLA between the two calls (tiny [B,G] math).

``dgamma = sum_b r2``, ``dbeta = sum_b r1``. Row blocks bound VMEM to ~2 MB
per operand regardless of image size. On non-TPU backends the custom_vjp
falls back to the XLA reference recompute.
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


def _row_chunk(hw: int, cap: int = 2048) -> int:
    chunk = hw
    while chunk > cap:
        if chunk % 2:
            break
        chunk //= 2
    return chunk


def _kernel(x_ref, scale_ref, bias_ref, gmap_ref, out_ref, mean_ref, inv_ref,
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
    # Residuals for the fused backward (no stats recompute there). The stats
    # refs hold the FULL [B, G] array (tiny; full-array blocks satisfy
    # Mosaic's sublane/lane constraints where a (1, G) block would not);
    # each grid step writes its batch row.
    row = pl.ds(pl.program_id(0), 1)
    mean_ref[row, :] = mean_g
    inv_ref[row, :] = inv_g

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
             num_groups: int, eps: float):
    """Returns (out [B,H,W,C], mean_g [B,G], inv_g [B,G])."""
    b, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    hw = h * w
    count = hw * (c // num_groups)
    chunk = _row_chunk(hw)
    kernel = functools.partial(_kernel, eps=eps, count=count, chunk=chunk)
    out, mean_g, inv_g = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((b, num_groups), lambda i: (0, 0)),
            pl.BlockSpec((b, num_groups), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((b, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, num_groups), jnp.float32),
        ],
    )(
        x.reshape(b, hw, c),
        scale.reshape(1, c),
        bias.reshape(1, c),
        jnp.asarray(_group_map_np(c, num_groups)),
    )
    return out.reshape(b, h, w, c), mean_g, inv_g


def _dn_terms(xb, gb, mean_c, inv_c, scale, bias):
    """Shared recompute: xhat and dn = dL/d(norm-affine output) through SiLU."""
    xhat = (xb - mean_c) * inv_c
    n = xhat * scale + bias
    sig = jax.lax.logistic(n)
    dn = gb * sig * (1.0 + n * (1.0 - sig))
    return xhat, dn


def _bwd_reduce_kernel(x_ref, g_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                       r1_ref, r2_ref):
    """Accumulate r1 = sum(dn), r2 = sum(dn*xhat) over the row-block axis.

    Per-batch aux refs (mean/inv/r1/r2) hold the FULL [B, C] arrays (tiny;
    full-array blocks satisfy Mosaic's tiling constraints where (1, C)
    blocks would not); each grid step addresses its batch row."""
    i, j = pl.program_id(0), pl.program_id(1)
    row = pl.ds(i, 1)
    xb = x_ref[:].astype(jnp.float32)
    gb = g_ref[:].astype(jnp.float32)
    xhat, dn = _dn_terms(xb, gb, mean_ref[row, :], inv_ref[row, :],
                         scale_ref[:].astype(jnp.float32),
                         bias_ref[:].astype(jnp.float32))
    p1 = jnp.sum(dn, axis=0, keepdims=True)
    p2 = jnp.sum(dn * xhat, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        r1_ref[row, :] = p1
        r2_ref[row, :] = p2

    @pl.when(j != 0)
    def _():
        r1_ref[row, :] += p1
        r2_ref[row, :] += p2


def _bwd_dx_kernel(x_ref, g_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                   a_ref, b_ref, dx_ref):
    """dx = inv * (dn*gamma - a_c - xhat*b_c) for one row block."""
    row = pl.ds(pl.program_id(0), 1)
    xb = x_ref[:].astype(jnp.float32)
    gb = g_ref[:].astype(jnp.float32)
    inv_c = inv_ref[row, :]
    xhat, dn = _dn_terms(xb, gb, mean_ref[row, :], inv_c,
                         scale_ref[:].astype(jnp.float32),
                         bias_ref[:].astype(jnp.float32))
    dxhat = dn * scale_ref[:].astype(jnp.float32)
    dx = inv_c * (dxhat - a_ref[row, :] - xhat * b_ref[row, :])
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _bwd_pallas(x, scale, bias, mean_g, inv_g, g, num_groups: int):
    """Fused backward: (dx, dscale, dbias). All Pallas except tiny [B,G] glue."""
    b, h, w, c = x.shape
    hw = h * w
    count = hw * (c // num_groups)
    chunk = _row_chunk(hw)
    nb = hw // chunk
    gmap = jnp.asarray(_group_map_np(c, num_groups))  # [C, G]

    x2 = x.reshape(b, hw, c)
    g2 = g.reshape(b, hw, c)
    scale2 = scale.reshape(1, c).astype(jnp.float32)
    bias2 = bias.reshape(1, c).astype(jnp.float32)
    # Per-batch per-channel stats rows for the kernels.
    mean_c = jnp.dot(mean_g, gmap.T)  # [B, C]
    inv_c = jnp.dot(inv_g, gmap.T)

    row_block = lambda i, j: (i, j, 0)
    full_bc = lambda i, j: (0, 0)  # whole [B, C] aux array resident in VMEM

    r1, r2 = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((None, chunk, c), row_block),
            pl.BlockSpec((None, chunk, c), row_block),
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((1, c), full_bc),
            pl.BlockSpec((1, c), full_bc),
        ],
        out_specs=[
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((b, c), full_bc),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
    )(x2, g2, mean_c, inv_c, scale2, bias2)

    # Group-fold the correction terms (tiny XLA math between the two calls).
    a_g = jnp.dot(r1 * scale2, gmap) / count  # [B, G]
    b_g = jnp.dot(r2 * scale2, gmap) / count
    a_c = jnp.dot(a_g, gmap.T)  # [B, C]
    b_c = jnp.dot(b_g, gmap.T)

    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((None, chunk, c), row_block),
            pl.BlockSpec((None, chunk, c), row_block),
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((1, c), full_bc),
            pl.BlockSpec((1, c), full_bc),
            pl.BlockSpec((b, c), full_bc),
            pl.BlockSpec((b, c), full_bc),
        ],
        out_specs=pl.BlockSpec((None, chunk, c), row_block),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
    )(x2, g2, mean_c, inv_c, scale2, bias2, a_c, b_c)

    dscale = jnp.sum(r2, axis=0).astype(scale.dtype).reshape(scale.shape)
    dbias = jnp.sum(r1, axis=0).astype(bias.dtype).reshape(bias.shape)
    return dx.reshape(b, h, w, c), dscale, dbias


def _xla_reference(x, scale, bias, num_groups, eps):
    from ..norm import group_norm

    y = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
    # Same dtype discipline as the kernel: activation math in input dtype.
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def groupnorm_silu_pallas(x, scale, bias, num_groups: int, eps: float = 1e-6):
    """silu(group_norm(x, scale, bias)) on NHWC via a fused Pallas kernel."""
    out, _, _ = _forward(x, scale, bias, num_groups, eps)
    return out


def _fwd(x, scale, bias, num_groups, eps):
    out, mean_g, inv_g = _forward(x, scale, bias, num_groups, eps)
    return out, (x, scale, bias, mean_g, inv_g)


def _bwd(num_groups, eps, residuals, g):
    x, scale, bias, mean_g, inv_g = residuals
    if jax.default_backend() == "tpu":
        return _bwd_pallas(x, scale, bias, mean_g, inv_g, g, num_groups)
    _, vjp = jax.vjp(lambda xx, ss, bb: _xla_reference(xx, ss, bb, num_groups, eps),
                     x, scale, bias)
    return vjp(g)


groupnorm_silu_pallas.defvjp(_fwd, _bwd)
