"""Flash attention Pallas TPU kernels (forward + backward).

Tiled softmax attention for the VAE bottleneck / UNet spatial attention.
Sequence lengths here are spatial token counts (32x32 = 1024 at the default
config), so a q-tile of 256 with full-resident k/v keeps everything in VMEM
while the running-max/running-sum recurrence keeps the kernel correct for
much larger maps (image-resolution scaling, SURVEY.md §5.7).

Backward: at the bottleneck's sizes the full [S, S] score matrix fits VMEM
(S=1024 -> 4 MB f32), so the backward is ONE whole-matrix kernel per
(batch, head): recompute p = softmax(qk^T), then
``dv = p^T g``, ``dp = g v^T``, ``ds = p * (dp - rowsum(dp * p))``,
``dq = ds k * scale``, ``dk = ds^T q * scale`` — five MXU matmuls, zero
intermediate HBM traffic. Sizes whose VMEM footprint exceeds the budget
fall back to rematerializing through the XLA reference attention (the
standard remat trade), as does the CPU backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["flash_attention"]

_Q_BLOCK = 256


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[:].astype(jnp.float32)  # [Qb, D]
    qb = q.shape[0]
    s = k_ref.shape[0]
    kv_block = min(_Q_BLOCK, s)
    num_kv = pl.cdiv(s, kv_block)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        start = pl.multiple_of(i * kv_block, kv_block)
        kv = k_ref[pl.ds(start, kv_block), :].astype(jnp.float32)
        vv = v_ref[pl.ds(start, kv_block), :].astype(jnp.float32)
        scores = jnp.dot(q, kv.T, preferred_element_type=jnp.float32) * scale
        m_cur = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        correction = jnp.exp(m_prev - m_cur)
        p = jnp.exp(scores - m_cur)
        l_cur = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jnp.dot(p, vv, preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    acc0 = jnp.zeros((qb, v_ref.shape[1]), jnp.float32)
    m0 = jnp.full((qb, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((qb, 1), jnp.float32)
    acc, _, l_final = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    out_ref[:] = (acc / l_final).astype(out_ref.dtype)


def _forward(q, k, v):
    """q/k/v: [B, H, S, D] -> [B, H, S, D]."""
    b, h, s, d = q.shape
    scale = d**-0.5
    q_block = min(_Q_BLOCK, s)
    kernel = functools.partial(_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b, h, pl.cdiv(s, q_block)),
        in_specs=[
            pl.BlockSpec((None, None, q_block, d), lambda i, j, n: (i, j, n, 0)),
            pl.BlockSpec((None, None, s, d), lambda i, j, n: (i, j, 0, 0)),
            pl.BlockSpec((None, None, s, d), lambda i, j, n: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, q_block, d), lambda i, j, n: (i, j, n, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
    )(q, k, v)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    # Matmuls stay in the INPUT dtype (bf16 in production) with f32
    # accumulation — upcasting operands to f32 quarters the MXU rate and
    # measured 2.4x slower than the XLA-remat backward; softmax/correction
    # math runs in f32.
    q = q_ref[:]   # [S, D]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    in_dtype = q.dtype

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [S, S] f32
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p_lp = p.astype(in_dtype)

    dv = jnp.dot(p_lp.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = (p * (dp - delta)).astype(in_dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale

    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


# VMEM budget for the whole-matrix backward: ~2 live [S,S] f32 buffers
# (scores/p and dp/ds alias in sequence) + [S,D] operands/outputs.
_BWD_VMEM_BUDGET = 14 * 1024 * 1024


def _bwd_pallas_supported(s: int, d: int) -> bool:
    footprint = 2 * s * s * 4 + 10 * s * d * 4
    return footprint <= _BWD_VMEM_BUDGET


def _bwd_pallas(q, k, v, g):
    b, h, s, d = q.shape
    kernel = functools.partial(_bwd_kernel, scale=d**-0.5)
    full = pl.BlockSpec((None, None, s, d), lambda i, j: (i, j, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[full, full, full, full],
        out_specs=[full, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ],
    )(q, k, v, g)


def _xla_reference(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores * (d**-0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@jax.custom_vjp
def flash_attention(q, k, v):
    """Softmax attention over [B, H, S, D] tensors (Pallas TPU forward)."""
    return _forward(q, k, v)


def _fwd(q, k, v):
    return _forward(q, k, v), (q, k, v)


def _bwd(residuals, g):
    import os

    q, k, v = residuals
    s, d = q.shape[-2], q.shape[-1]
    # PTI_PALLAS_ATTN_BWD=0 forces the XLA-remat backward (A/B measurement
    # and emergency rollback switch; default: Pallas when it fits VMEM).
    enabled = os.environ.get("PTI_PALLAS_ATTN_BWD", "1") != "0"
    if enabled and jax.default_backend() == "tpu" and _bwd_pallas_supported(s, d):
        return _bwd_pallas(q, k, v, g)
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
