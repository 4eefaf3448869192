"""Diffusion UNet — timestep-conditioned latent-space UNet (Flax/NHWC).

Functional equivalent of MONAI ``DiffusionModelUNet`` as wrapped by the
reference (``src/pti_ldm_vae/models/unet.py:34-142``; conditioning recipe at
``models/README.md:113-126``): sinusoidal timestep embedding -> MLP; per-level
time-conditioned ResBlocks with optional spatial transformer blocks
(self-attention + cross-attention over a ``context`` sequence + GEGLU FF);
strided-conv downsampling; skip-concatenating up path with nearest-x2 upsample;
GroupNorm->SiLU->conv head predicting noise.

The reference never trains this model ("kept for potential future use",
``models/README.md:9-10``); the driver's north star includes the LDM DDIM loop,
so it is first-class here: see ``train/diffusion.py`` for the ``lax.scan``
DDIM sampler and the latent-diffusion train step.

``create_condition_projector`` parity: latent [B, H, W, C] -> [B, HW, C] ->
Dense(cross_attention_dim) context (reference ``unet.py:6-31``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.norm import DEFAULT_NORM_STATS, group_norm, group_norm_silu
from ..ops.resize import upsample_nearest_2x

__all__ = [
    "DiffusionUNet",
    "diffusion_unet_from_config",
    "timestep_embedding",
    "ConditionProjector",
    "project_latent_condition",
]


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding [B, dim] (sin | cos halves, MONAI convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeResBlock(nn.Module):
    """GroupNorm/SiLU/conv ResBlock with additive timestep embedding."""

    out_channels: int
    norm_num_groups: int
    norm_eps: float = 1e-6
    norm_stats: str = DEFAULT_NORM_STATS
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        conv_kw = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        in_channels = x.shape[-1]
        k3 = (3,) * (x.ndim - 2)
        scale1 = self.param("norm1_scale", nn.initializers.ones, (in_channels,))
        bias1 = self.param("norm1_bias", nn.initializers.zeros, (in_channels,))
        h = group_norm_silu(x, scale1, bias1, num_groups=self.norm_num_groups,
                            eps=self.norm_eps, stats=self.norm_stats)
        h = nn.Conv(self.out_channels, k3, padding=1, name="conv1", **conv_kw)(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj", **conv_kw)(
            jax.nn.silu(temb.astype(self.compute_dtype))
        )
        h = h + t.reshape(t.shape[0], *((1,) * (x.ndim - 2)), t.shape[-1])
        scale2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        bias2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        h = group_norm_silu(h, scale2, bias2, num_groups=self.norm_num_groups,
                            eps=self.norm_eps, stats=self.norm_stats)
        h = nn.Conv(self.out_channels, k3, padding=1, name="conv2", **conv_kw)(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1,) * (x.ndim - 2), name="skip", **conv_kw)(x)
        return x + h


class TransformerBlock(nn.Module):
    """Pre-norm self-attn + cross-attn + GEGLU FF (LDM BasicTransformerBlock)."""

    num_heads: int
    cross_attention_dim: int | None = None
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None) -> jnp.ndarray:
        c = x.shape[-1]
        kw = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)

        # self-attention
        h = nn.LayerNorm(name="norm1", dtype=self.compute_dtype)(x)
        q = nn.Dense(c, use_bias=False, name="attn1_q", **kw)(h)
        k = nn.Dense(c, use_bias=False, name="attn1_k", **kw)(h)
        v = nn.Dense(c, use_bias=False, name="attn1_v", **kw)(h)
        # use_pallas=None: flash kernel auto-engages on TPU at >=512 tokens
        # (high-res latents); XLA at the tiny bottleneck seqs.
        attn = multi_head_attention(q, k, v, num_heads=self.num_heads, use_pallas=None)
        x = x + nn.Dense(c, name="attn1_out", **kw)(attn)

        # cross-attention (context sequence)
        if context is not None:
            h = nn.LayerNorm(name="norm2", dtype=self.compute_dtype)(x)
            q = nn.Dense(c, use_bias=False, name="attn2_q", **kw)(h)
            k = nn.Dense(c, use_bias=False, name="attn2_k", **kw)(context.astype(self.compute_dtype))
            v = nn.Dense(c, use_bias=False, name="attn2_v", **kw)(context.astype(self.compute_dtype))
            b, sq, _ = q.shape
            sk = k.shape[1]
            head_dim = c // self.num_heads
            qh = q.reshape(b, sq, self.num_heads, head_dim)
            kh = k.reshape(b, sk, self.num_heads, head_dim)
            vh = v.reshape(b, sk, self.num_heads, head_dim)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
            scores = scores * (head_dim**-0.5)
            weights = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(b, sq, c)
            x = x + nn.Dense(c, name="attn2_out", **kw)(attn)

        # GEGLU feed-forward
        h = nn.LayerNorm(name="norm3", dtype=self.compute_dtype)(x)
        gate = nn.Dense(c * 8, name="ff_in", **kw)(h)
        a, g = jnp.split(gate, 2, axis=-1)
        # exact erf GELU (torch default) — jax.nn.gelu defaults to tanh approx
        h = a * jax.nn.gelu(g, approximate=False)
        return x + nn.Dense(c, name="ff_out", **kw)(h)


class SpatialTransformer(nn.Module):
    """norm -> 1x1 proj_in -> transformer -> 1x1 proj_out, residual."""

    num_heads: int
    norm_num_groups: int
    norm_eps: float = 1e-6
    norm_stats: str = DEFAULT_NORM_STATS
    cross_attention_dim: int | None = None
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray | None) -> jnp.ndarray:
        b, c = x.shape[0], x.shape[-1]
        k1 = (1,) * (x.ndim - 2)
        kw = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        hidden = group_norm(x, scale, bias, num_groups=self.norm_num_groups,
                            eps=self.norm_eps, stats=self.norm_stats)
        hidden = nn.Conv(c, k1, name="proj_in", **kw)(hidden).reshape(b, -1, c)
        hidden = TransformerBlock(
            num_heads=self.num_heads, cross_attention_dim=self.cross_attention_dim,
            compute_dtype=self.compute_dtype, param_dtype=self.param_dtype, name="block",
        )(hidden, context)
        hidden = nn.Conv(c, k1, name="proj_out", **kw)(hidden.reshape(x.shape))
        return x + hidden


class DiffusionUNet(nn.Module):
    spatial_dims: int = 2
    in_channels: int = 4
    out_channels: int = 4
    channels: Sequence[int] = (32, 64, 128, 256)
    attention_levels: Sequence[bool] = (False, True, True, True)
    num_head_channels: Sequence[int] = (0, 32, 32, 32)
    num_res_blocks: int = 2
    with_conditioning: bool = True
    cross_attention_dim: int = 512
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    # Activation checkpointing (config key "remat"): recompute each
    # TimeResBlock/SpatialTransformer's internals in the backward instead of
    # storing them. Variable paths unchanged (nn.remat is a lifted transform).
    remat: bool = False
    # GroupNorm statistics formulation (top-level config key "norm_stats",
    # same placement as "remat"; see ops/norm.py): "one_pass" fuses the
    # mean/E[x^2] reductions into one HBM read per norm.
    norm_stats: str = DEFAULT_NORM_STATS
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _heads(self, level: int) -> int:
        nhc = self.num_head_channels[level]
        return max(1, self.channels[level] // nhc) if nhc else 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Predict noise for noisy channel-last latents ``x`` (any spatial
        rank matching ``spatial_dims``) at ``timesteps``."""
        if self.spatial_dims not in (1, 2, 3):
            raise ValueError(f"spatial_dims must be 1, 2, or 3, got {self.spatial_dims}")
        k3 = (3,) * self.spatial_dims
        kw = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        ctx = context if self.with_conditioning else None
        Res = nn.remat(TimeResBlock) if self.remat else TimeResBlock
        Attn = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer

        temb_dim = self.channels[0] * 4
        temb = timestep_embedding(timesteps, self.channels[0])
        temb = nn.Dense(temb_dim, name="time_mlp_1", **kw)(temb)
        temb = nn.Dense(temb_dim, name="time_mlp_2", **kw)(jax.nn.silu(temb))

        h = nn.Conv(self.channels[0], k3, padding=1, name="conv_in", **kw)(
            x.astype(self.compute_dtype)
        )
        skips = [h]
        # down path
        for level, ch in enumerate(self.channels):
            for block in range(self.num_res_blocks):
                h = Res(
                    ch, self.norm_num_groups, self.norm_eps,
                    norm_stats=self.norm_stats,
                    compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                    name=f"down_{level}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = Attn(
                        self._heads(level), self.norm_num_groups, self.norm_eps,
                        norm_stats=self.norm_stats,
                        cross_attention_dim=self.cross_attention_dim if ctx is not None else None,
                        compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                        name=f"down_{level}_attn_{block}",
                    )(h, ctx)
                skips.append(h)
            if level != len(self.channels) - 1:
                h = nn.Conv(ch, k3, strides=(2,) * self.spatial_dims, padding=1,
                            name=f"down_{level}_downsample", **kw)(h)
                skips.append(h)

        # mid
        h = Res(self.channels[-1], self.norm_num_groups, self.norm_eps,
                         norm_stats=self.norm_stats,
                         compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                         name="mid_res_1")(h, temb)
        h = Attn(
            self._heads(len(self.channels) - 1), self.norm_num_groups, self.norm_eps,
            norm_stats=self.norm_stats,
            cross_attention_dim=self.cross_attention_dim if ctx is not None else None,
            compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="mid_attn",
        )(h, ctx)
        h = Res(self.channels[-1], self.norm_num_groups, self.norm_eps,
                         norm_stats=self.norm_stats,
                         compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                         name="mid_res_2")(h, temb)

        # up path (skip concatenation)
        for level in reversed(range(len(self.channels))):
            ch = self.channels[level]
            for block in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = Res(
                    ch, self.norm_num_groups, self.norm_eps,
                    norm_stats=self.norm_stats,
                    compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                    name=f"up_{level}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = Attn(
                        self._heads(level), self.norm_num_groups, self.norm_eps,
                        norm_stats=self.norm_stats,
                        cross_attention_dim=self.cross_attention_dim if ctx is not None else None,
                        compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                        name=f"up_{level}_attn_{block}",
                    )(h, ctx)
            if level != 0:
                h = upsample_nearest_2x(h)
                h = nn.Conv(ch, k3, padding=1, name=f"up_{level}_upsample", **kw)(h)

        scale = self.param("norm_out_scale", nn.initializers.ones, (h.shape[-1],))
        bias = self.param("norm_out_bias", nn.initializers.zeros, (h.shape[-1],))
        h = group_norm_silu(h, scale, bias, num_groups=self.norm_num_groups,
                            eps=self.norm_eps, stats=self.norm_stats)
        out = nn.Conv(self.out_channels, k3, padding=1, name="conv_out", **kw)(h)
        return out.astype(jnp.float32)


class ConditionProjector(nn.Module):
    """Linear(latent_ch -> cross_attention_dim) (reference ``unet.py:6-31``)."""

    cross_attention_dim: int = 512
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, condition: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.cross_attention_dim, param_dtype=self.param_dtype)(condition)


def project_latent_condition(projector_apply, latent_nhwc: jnp.ndarray) -> jnp.ndarray:
    """Channel-last latent [B, *spatial, C] -> tokens [B, prod(spatial), C] ->
    context (reference conditioning recipe, ``models/README.md:113-126``)."""
    b, c = latent_nhwc.shape[0], latent_nhwc.shape[-1]
    tokens = latent_nhwc.reshape(b, -1, c)
    return projector_apply(tokens)


def diffusion_unet_from_config(
    config: dict, *, compute_dtype: Any = jnp.float32, remat: bool | None = None,
    norm_stats: str | None = None,
) -> DiffusionUNet:
    """Parity with ``DiffusionUNet.from_config`` (``unet.py:95-116``).

    ``remat``: explicit override for activation checkpointing.  ``None``
    (default) falls back to the ``"remat"`` key inside ``config`` — but note
    the documented placement is the TOP-LEVEL config key, which the diffusion
    CLIs read and pass here explicitly (same placement the VAE uses via
    ``train/loop.py`` / ``utils/vae_loader.py``).
    """
    if remat is None:
        remat = bool(config.get("remat", False))
    if norm_stats is None:
        norm_stats = str(config.get("norm_stats", DEFAULT_NORM_STATS))
    return DiffusionUNet(
        spatial_dims=config["spatial_dims"],
        in_channels=config["in_channels"],
        out_channels=config["out_channels"],
        channels=tuple(config["channels"]),
        attention_levels=tuple(config["attention_levels"]),
        num_head_channels=tuple(config["num_head_channels"]),
        num_res_blocks=config.get("num_res_blocks", 2),
        with_conditioning=config.get("with_conditioning", True),
        cross_attention_dim=config.get("cross_attention_dim", 512),
        norm_num_groups=config.get("norm_num_groups", 32),
        remat=remat,
        norm_stats=norm_stats,
        compute_dtype=compute_dtype,
    )
