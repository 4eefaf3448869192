"""3x3 conv Pallas TPU kernel for small channel counts (NHWC).

Why: XLA's TPU lowering of 3x3 convs at the channel widths this workload
lives at (32-128) runs at ~8-20 TF/s on a v5e (measured, docs/ARCHITECTURE.md)
— it decomposes into K=C matmuls that waste MXU lanes AND, in its im2col
form, reads a 9x-expanded patch matrix from HBM. This kernel keeps the
image resident in VMEM, builds the im2col patch matrix *in VMEM* (zero extra
HBM traffic), and issues one [tile_rows*W, 9*Cin] x [9*Cin, Cout] matmul per
row tile — a single MXU-shaped contraction per tile at raw-input bandwidth.

Scope: stride 1, 'SAME' 1-pixel padding (the res-block convs, which dominate
the step), NHWC, any Cin/Cout that fit the VMEM budget. The caller pads
spatially (one cheap fused pad); grid is over (batch,) with the padded image
as the block, so Pallas double-buffers image n+1's DMA behind image n's
compute.

Backward: ``conv3x3`` is wrapped in ``jax.custom_vjp`` — the input gradient
is the same kernel applied to dy with the spatially-flipped, transposed
weights (conv backprop identity), and the filter gradient is a second Pallas
kernel accumulating patches(x)^T @ dy per row tile in f32 VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["conv3x3", "conv3x3_pallas_supported"]

_ROW_TILE = 16  # output rows per inner matmul


def _fwd_kernel(x_ref, w_ref, o_ref, *, h: int, w: int, row_tile: int):
    """x: [1, H+2, W+2, Cin] VMEM; w: [9*Cin, Cout]; o: [1, H, W, Cout]."""
    cin = x_ref.shape[-1]
    wmat = w_ref[:]

    def tile_body(t, _):
        base = t * row_tile
        cols = []
        for dy in range(3):
            for dx in range(3):
                sl = x_ref[0, pl.ds(base + dy, row_tile), pl.ds(dx, w), :]
                cols.append(sl.reshape(row_tile * w, cin))
        patches = jnp.concatenate(cols, axis=1)  # [row_tile*W, 9*Cin]
        acc = jnp.dot(patches, wmat, preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(base, row_tile), :, :] = acc.reshape(
            row_tile, w, o_ref.shape[-1]
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // row_tile, tile_body, 0, unroll=False)


def _dw_kernel(x_ref, dy_ref, dw_ref, *, h: int, w: int, row_tile: int):
    """Filter gradient: accumulate patches(x)^T @ dy over row tiles and batch.

    x: [1, H+2, W+2, Cin]; dy: [1, H, W, Cout]; dw: [9*Cin, Cout] (f32),
    revisited across the batch grid — accumulate, zero-init on first step.
    """
    cin = x_ref.shape[-1]
    cout = dy_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def tile_body(t, _):
        base = t * row_tile
        cols = []
        for dy_off in range(3):
            for dx in range(3):
                sl = x_ref[0, pl.ds(base + dy_off, row_tile), pl.ds(dx, w), :]
                cols.append(sl.reshape(row_tile * w, cin))
        patches = jnp.concatenate(cols, axis=1)  # [M, 9*Cin]
        dy_tile = dy_ref[0, pl.ds(base, row_tile), :, :].reshape(row_tile * w, cout)
        # [9*Cin, Cout] += patches^T @ dy  (contraction over the M dim)
        part = jax.lax.dot_general(
            patches, dy_tile, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_ref[:] += part
        return 0

    jax.lax.fori_loop(0, h // row_tile, tile_body, 0, unroll=False)


def _row_tile_for(h: int) -> int:
    for cand in (_ROW_TILE, 8, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


def conv3x3_pallas_supported(x_shape, w_shape) -> bool:
    """VMEM feasibility check (padded image + patches + weights resident)."""
    if len(x_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    _, h, w, cin = x_shape
    cout = w_shape[3]
    if h < 4 or w < 4:
        return False
    row_tile = _row_tile_for(h)
    image = (h + 2) * (w + 2) * cin * 2
    patches = row_tile * w * 9 * cin * 4
    out = h * w * cout * 2
    weights = 9 * cin * cout * 4
    return image + patches + out + weights + row_tile * w * cout * 4 < 12 * 2**20


def _conv3x3_fwd_pallas(x: jnp.ndarray, wmat: jnp.ndarray, h: int, w: int,
                        cout: int) -> jnp.ndarray:
    b = x.shape[0]
    cin = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    row_tile = _row_tile_for(h)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, row_tile=row_tile),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
    )(xp, wmat)


def _conv3x3_dw_pallas(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    row_tile = _row_tile_for(h)
    return pl.pallas_call(
        functools.partial(_dw_kernel, h=h, w=w, row_tile=row_tile),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
    )(xp, dy)


@jax.custom_vjp
def conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC (no bias; add outside)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    wmat = kernel.reshape(9 * cin, cout).astype(x.dtype)
    return _conv3x3_fwd_pallas(x, wmat, h, w, cout)


def _vjp_fwd(x, kernel):
    return conv3x3(x, kernel), (x, kernel)


def _vjp_bwd(res, g):
    x, kernel = res
    cin = kernel.shape[2]
    # dx: conv of dy with the spatially-flipped kernel, in/out channels swapped.
    k_flip = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWOI'
    wmat_bwd = k_flip.reshape(9 * kernel.shape[3], cin).astype(g.dtype)
    b, h, w, _ = x.shape
    dx = _conv3x3_fwd_pallas(g, wmat_bwd, h, w, cin)
    # dW: patches(x)^T @ dy, accumulated over batch in the kernel.
    dw = _conv3x3_dw_pallas(x, g).reshape(3, 3, cin, kernel.shape[3])
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
