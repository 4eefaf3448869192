"""Spatial self/cross-attention over feature maps (NHWC).

Equivalent of MONAI's ``SpatialAttentionBlock`` / ``SABlock`` as used in the
AutoencoderKL bottleneck and the diffusion UNet (SURVEY.md §2.2). At the VAE
bottleneck (32x32 map, C=128) the sequence is 1024 tokens — small enough that
the whole score matrix fits in VMEM, so a single fused ``jnp`` formulation is
already MXU-bound under XLA; a Pallas flash-attention kernel is provided for
larger maps (``ops/pallas/flash_attention.py``) and selected by ``use_pallas``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["multi_head_attention", "attention_flops"]


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    use_pallas: bool | None = False,
) -> jnp.ndarray:
    """Multi-head attention over [B, S, C] tensors (already projected).

    Scale is 1/sqrt(head_dim), softmax in f32 — matching torch
    ``scaled_dot_product_attention`` semantics used by MONAI's SABlock.

    ``use_pallas=None`` auto-selects: the Pallas flash kernel on TPU when the
    sequence is long enough to amortize kernel launch/tiling (>= 512 tokens,
    where it measures faster than XLA — docs/ARCHITECTURE.md); XLA otherwise.
    """
    b, s, c = q.shape
    if c % num_heads:
        raise ValueError(f"hidden size {c} not divisible by num_heads {num_heads}")
    head_dim = c // num_heads
    if use_pallas is None:
        import jax

        use_pallas = jax.default_backend() == "tpu" and s >= 512

    if use_pallas:
        from .pallas.flash_attention import flash_attention

        qh = q.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        out = flash_attention(qh, kh, vh)
        return out.transpose(0, 2, 1, 3).reshape(b, s, c)

    qh = q.reshape(b, s, num_heads, head_dim)
    kh = k.reshape(b, s, num_heads, head_dim)
    vh = v.reshape(b, s, num_heads, head_dim)
    scale = head_dim**-0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    weights = jnp.exp(scores * scale - jnp.max(scores * scale, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), vh)
    return out.reshape(b, s, c)


def attention_flops(batch: int, seq: int, channels: int) -> int:
    """FLOPs of one self-attention (scores + weighted sum), for rooflines."""
    return 2 * 2 * batch * seq * seq * channels
