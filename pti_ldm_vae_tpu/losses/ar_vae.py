"""Attribute-Regularized VAE loss — vectorized, static-shape, jit-safe.

Behavioral equivalent of reference ``compute_ar_vae_loss``
(``src/pti_ldm_vae/models/losses.py:69-166``): per attribute, over ordered
sample pairs (i, j), i != j, with attribute delta ``Da = a_j - a_i`` and
latent-channel delta ``Dz = z_j - z_i``::

    L_attr = mean_{pairs: sign(Da) != 0} (tanh(delta * Dz) - sign(Da))^2

The reference builds Python pair lists per batch (O(B^2) host loop) and
``random.sample``s a subset; that is untraceable. TPU-first redesign:

* "all" mode: full [B, B] difference matrices with a validity mask
  (``sign != 0`` — the diagonal is masked automatically since Da_ii = 0,
  exactly reproducing the i != j + nonzero-ordering filter of the reference).
* "subset" mode: ``jax.random.choice`` without replacement over the
  enumerated B*(B-1) ordered pairs (static count), seeded by an explicit key —
  same distribution as ``random.sample`` but deterministic under jit.

All attributes are stacked into one [A, B] tensor so the whole loss is a
handful of fused VPU ops — no per-attribute Python loop at trace time beyond
static unrolling over the (config-fixed, small) attribute set.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["ARVaeSpec", "make_ar_vae_spec", "compute_ar_vae_loss"]


class ARVaeSpec:
    """Static (trace-time) AR-VAE configuration: attribute order, channels, deltas.

    Built once from the config block (``config/*.json`` key
    ``regularized_attributes``; semantics at reference ``losses.py:111-128``).
    """

    def __init__(
        self,
        names: tuple[str, ...],
        channels: tuple[int, ...],
        deltas: tuple[float, ...],
        pairwise_mode: str,
        subset_pairs: int | None,
    ):
        if pairwise_mode not in {"all", "subset"}:
            raise ValueError(f"pairwise must be 'all' or 'subset', got {pairwise_mode}")
        if pairwise_mode == "subset" and (subset_pairs is None or subset_pairs <= 0):
            raise ValueError("subset_pairs must be a positive integer when pairwise='subset'")
        self.names = names
        self.channels = channels
        self.deltas = deltas
        self.pairwise_mode = pairwise_mode
        self.subset_pairs = subset_pairs

    def __len__(self) -> int:
        return len(self.names)


def make_ar_vae_spec(
    attribute_latent_mapping: dict[str, Any],
    *,
    pairwise_mode: str = "all",
    subset_pairs: int | None = None,
    delta_global: dict[str, Any] | None = None,
    latent_dim: int | None = None,
) -> ARVaeSpec:
    """Validate + freeze the attribute->channel mapping (reference
    ``losses.py:111-128`` validation semantics, done once at setup instead of
    per step)."""
    names, channels, deltas = [], [], []
    for attr_name, mapping in attribute_latent_mapping.items():
        if str(attr_name).startswith("_"):
            continue
        target_latent = int(mapping["latent_channel"])
        if latent_dim is not None and target_latent >= latent_dim:
            raise ValueError(
                f"Latent channel {target_latent} for attribute {attr_name} "
                f"exceeds latent size {latent_dim}"
            )
        delta_attr = mapping.get("delta")
        if delta_attr is None and delta_global and delta_global.get("enabled", False):
            delta_attr = delta_global.get("value")
        if delta_attr is None:
            raise ValueError(f"Delta not provided for {attr_name} and no delta_global fallback.")
        names.append(attr_name)
        channels.append(target_latent)
        deltas.append(float(delta_attr))
    return ARVaeSpec(tuple(names), tuple(channels), tuple(deltas), pairwise_mode, subset_pairs)


def _pool_latents(latent_vectors: jnp.ndarray) -> jnp.ndarray:
    """[B, C] from [B, H, W, C] (NHWC) or [B, C, H, W] or [B, C].

    The reference spatially mean-pools 4-D latents (``losses.py:93-94``).
    NHWC is detected by this framework's convention (channels last)."""
    if latent_vectors.ndim == 4:
        return jnp.mean(latent_vectors, axis=(1, 2))  # NHWC -> [B, C]
    if latent_vectors.ndim != 2:
        raise ValueError(f"Expected latent shape [B, C] or [B, H, W, C], got {latent_vectors.shape}")
    return latent_vectors


def compute_ar_vae_loss(
    latent_vectors: jnp.ndarray,
    attributes: dict[str, jnp.ndarray],
    spec: ARVaeSpec,
    *,
    rng: jax.Array | None = None,
    sample_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
    """Returns (total_loss, losses_per_attr, pair_counts_per_attr).

    ``rng`` is required for ``pairwise_mode="subset"`` (replaces the
    reference's untraced ``random.sample``, ``losses.py:133-136``).
    ``sample_mask`` ([B], 1=valid) excludes zero-padded samples from all
    pairs — needed because this framework pads the final batch to a static
    shape (the reference ships a ragged final batch instead).
    """
    z = _pool_latents(latent_vectors).astype(jnp.float32)  # [B, C]
    batch = z.shape[0]

    # Stack: [A, B] latent components and attribute values.
    z_sel = jnp.stack([z[:, c] for c in spec.channels], axis=0)
    try:
        a_sel = jnp.stack(
            [attributes[name].astype(jnp.float32) for name in spec.names], axis=0
        )
    except KeyError as exc:
        raise KeyError(f"Missing attribute values for {exc} in batch.") from exc
    deltas = jnp.asarray(spec.deltas, dtype=jnp.float32)[:, None]  # [A, 1]

    if spec.pairwise_mode == "all":
        # [A, B, B] ordered-pair difference matrices.
        d_a = a_sel[:, None, :] - a_sel[:, :, None]
        d_z = z_sel[:, None, :] - z_sel[:, :, None]
        ordering = jnp.sign(d_a)
        mask = ordering != 0.0  # diagonal excluded automatically (Da_ii == 0)
        if sample_mask is not None:
            valid = sample_mask.astype(bool)
            mask = mask & valid[None, :, None] & valid[None, None, :]
        pred = jnp.tanh(deltas[:, :, None] * d_z)
        sq = jnp.square(pred - ordering) * mask
        counts = jnp.sum(mask, axis=(1, 2))
        losses = jnp.sum(sq, axis=(1, 2)) / jnp.maximum(counts, 1)
    else:
        n_all = batch * (batch - 1)
        n_sub = min(int(spec.subset_pairs), n_all)
        if rng is None:
            raise ValueError("subset pairwise mode requires an rng key")
        flat = jax.random.choice(rng, n_all, shape=(n_sub,), replace=False)
        idx_i = flat // (batch - 1)
        j0 = flat % (batch - 1)
        idx_j = j0 + (j0 >= idx_i)  # skip the diagonal
        d_a = a_sel[:, idx_j] - a_sel[:, idx_i]  # [A, P]
        d_z = z_sel[:, idx_j] - z_sel[:, idx_i]
        ordering = jnp.sign(d_a)
        mask = ordering != 0.0
        if sample_mask is not None:
            valid = sample_mask.astype(bool)
            mask = mask & valid[None, idx_i] & valid[None, idx_j]
        pred = jnp.tanh(deltas * d_z)
        sq = jnp.square(pred - ordering) * mask
        counts = jnp.sum(mask, axis=1)
        losses = jnp.sum(sq, axis=1) / jnp.maximum(counts, 1)

    losses = jnp.where(counts > 0, losses, 0.0)
    total = jnp.sum(losses)
    losses_per_attr = {name: losses[i] for i, name in enumerate(spec.names)}
    counts_per_attr = {name: counts[i] for i, name in enumerate(spec.names)}
    return total, losses_per_attr, counts_per_attr
