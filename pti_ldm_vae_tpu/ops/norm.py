"""Normalization ops (NHWC), with an optional fused Pallas GroupNorm+SiLU path.

The VAE hot loop is dominated by [GroupNorm -> SiLU -> Conv3x3] blocks
(reference: MONAI ``AEKLResBlock``, see SURVEY.md §2.2). XLA already fuses the
elementwise chain into the conv's input; the Pallas kernel in
``ops/pallas/groupnorm_silu.py`` additionally fuses the two reduction passes
into a single VMEM-resident pass. Both paths produce identical math:

    y = silu((x - mean_g) / sqrt(var_g + eps) * scale + bias)

with mean/var over each group's (H, W, C/G) slab, matching
``torch.nn.GroupNorm`` (biased variance).
"""

from __future__ import annotations

import jax.numpy as jnp

from ._norm_default import DEFAULT_NORM_STATS

__all__ = ["group_norm", "group_norm_silu", "instance_norm"]


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    eps: float = 1e-6,
    stats: str = DEFAULT_NORM_STATS,
) -> jnp.ndarray:
    """GroupNorm over channel-last input of any spatial rank (N..C);
    statistics in f32 regardless of input dtype.

    ``stats`` selects the statistics formulation:

    * ``"one_pass"`` (default since the measured v5e A/B win —
      +8.3%/+8.8%/+17% on train b8/b128/inference b128):
      ``var = mean(x^2) - mean(x)^2`` — both moments depend
      only on ``x``, so XLA's multi-output fusion computes them in ONE HBM
      pass. The train step is reduce-traffic bound off the conv floor
      (tools/train_step_hbm_model.py: norm stats are the top non-conv HBM
      category), making this the targeted lever. f32 accumulation; the
      difference form loses precision only when ``mean^2 >> var``
      (near-constant groups), which post-conv activations don't exhibit.
    * ``"two_pass"``: ``var = mean((x - mean)^2)`` — the centered
      form the torch/MONAI reference computes; the variance pass depends on
      the mean, so XLA emits TWO sequential reads of ``x`` from HBM. One
      config key away for bit-parity runs (the parity tools pin it).
    """
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    if stats not in ("two_pass", "one_pass"):
        raise ValueError(f"unknown stats mode {stats!r}")
    xg = x.astype(jnp.float32).reshape(x.shape[0], *spatial, num_groups, c // num_groups)
    axes = tuple(range(1, 1 + len(spatial))) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    if stats == "one_pass":
        m2 = jnp.mean(jnp.square(xg), axis=axes, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    eps: float = 1e-6,
    use_pallas: bool = False,
    stats: str = DEFAULT_NORM_STATS,
) -> jnp.ndarray:
    """Fused GroupNorm + SiLU. ``use_pallas=True`` selects the Pallas TPU kernel
    (4-D NHWC only; other ranks use the XLA formulation); ``stats`` selects the
    XLA statistics formulation (see :func:`group_norm`)."""
    # The Pallas kernel keeps one whole image in VMEM; above ~1.5M elements
    # (input + output + f32 stats temp > ~12 MB) it cannot fit — fall back to
    # the XLA formulation for those (only the first encoder level at 256^2).
    if use_pallas and x.ndim == 4 and x.shape[1] * x.shape[2] * x.shape[3] <= 1_572_864:
        from .pallas.groupnorm_silu import groupnorm_silu_pallas

        return groupnorm_silu_pallas(x, scale, bias, num_groups, eps)
    y = group_norm(x, scale, bias, num_groups=num_groups, eps=eps, stats=stats)
    yf = y.astype(jnp.float32)
    return (yf * (1.0 / (1.0 + jnp.exp(-yf)))).astype(x.dtype)


def instance_norm(
    x: jnp.ndarray,
    *,
    eps: float = 1e-5,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """InstanceNorm over channel-last input of any spatial rank (per-sample,
    per-channel spatial stats).

    Matches ``torch.nn.InstanceNorm{2,3}d`` defaults (``affine=False``,
    ``track_running_stats=False``) as used by the reference's
    PatchDiscriminator (``train_vae.py:268-275``, norm="INSTANCE").
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
