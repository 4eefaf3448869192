"""Config + model loading helpers (reference ``utils/vae_loader.py``).

``load_vae_model`` accepts either this framework's orbax checkpoint
directories or the reference's torch ``.pt/.pth`` files (raw state dict or
``{"autoencoder_state_dict": ...}``, reference ``vae_loader.py:38-43``) via
the MONAI-key converter — so reference-trained weights drive this framework
directly for parity runs.
"""

from __future__ import annotations

import os
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import jax
import jax.numpy as jnp

from ..checkpoint.orbax_io import load_pytree
from ..checkpoint.torch_convert import from_torch_state_dict
from ..config import load_config, load_config_namespace
from ..ops.norm import DEFAULT_NORM_STATS
from ..models.autoencoder_kl import AutoencoderKL, autoencoder_from_config

__all__ = [
    "load_vae_config",
    "load_vae_model",
    "load_autoencoder_params",
    "default_eval_output_dir",
]


def load_vae_config(config_file: str) -> SimpleNamespace:
    """Parity with reference ``load_vae_config`` (``vae_loader.py:11-24``)."""
    return load_config_namespace(config_file)


def load_autoencoder_params(
    checkpoint_path: str, model: AutoencoderKL, autoencoder_def: dict
) -> Any:
    """Load autoencoder params from orbax dir or torch .pth file."""
    path = str(checkpoint_path)
    if os.path.isdir(path):
        template = jax.eval_shape(
            lambda: model.init(
                jax.random.key(0), jnp.zeros((1, 32, 32, model.in_channels)), jax.random.key(1)
            )
        )
        tree = load_pytree(path)
        if "params_g" in tree:  # full train-state checkpoint
            tree = tree["params_g"]
        del template
        return tree
    # torch checkpoint
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = raw.get("autoencoder_state_dict", raw) if isinstance(raw, dict) else raw
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state_dict.items()}
    return from_torch_state_dict(state_dict, autoencoder_def)


def load_vae_model(
    config: Any, checkpoint_path: str, *, compute_dtype=jnp.float32,
    use_pallas_attention: bool | None = None,
    s2d_stem: "bool | str | None" = None,
) -> tuple[AutoencoderKL, Any]:
    """Returns (model, variables) — the functional analog of the reference's
    model-in-eval-mode (``vae_loader.py:27-43``)."""
    ae_def = config.autoencoder_def if hasattr(config, "autoencoder_def") else config["autoencoder_def"]
    # honor the top-level "remat" extension key (activation checkpointing):
    # inert on pure forwards, but PTI's tune stage differentiates the whole
    # decoder through this model, where remat buys back activation memory.
    remat = bool(
        getattr(config, "remat", False) if hasattr(config, "autoencoder_def")
        else config.get("remat", False)
    )
    # top-level "norm_stats" extension key ("one_pass": single-HBM-pass
    # GroupNorm moments; see ops/norm.py) — same placement as "remat".
    norm_stats = str(
        getattr(config, "norm_stats", DEFAULT_NORM_STATS) if hasattr(config, "autoencoder_def")
        else config.get("norm_stats", DEFAULT_NORM_STATS)
    )
    # top-level "s2d_stem" extension key (space-to-depth full-res path;
    # checkpoint-identical, ops/space_to_depth.py) — same placement.
    # Default "auto": inference loads gate per side on the traced batch
    # from the measured table (Encoder/Decoder._use_s2d) — small batches
    # take the s2d fast path (+69% at b8 on v5e), large ones the standard
    # form. "auto" / "encoder" / "decoder" pass through unchanged.
    # The keyword overrides the config (callers that DIFFERENTIATE through
    # the model — PTI — or pin reference numerics — exact parity mode —
    # must not inherit the inference-profile "auto").
    if s2d_stem is None:
        s2d_stem = (
            getattr(config, "s2d_stem", "auto") if hasattr(config, "autoencoder_def")
            else config.get("s2d_stem", "auto")
        )
    if s2d_stem not in ("auto", "encoder", "decoder"):
        s2d_stem = bool(s2d_stem)
    model = autoencoder_from_config(
        ae_def, compute_dtype=compute_dtype,
        use_pallas_attention=use_pallas_attention, remat=remat,
        norm_stats=norm_stats, s2d_stem=s2d_stem,
    )
    variables = load_autoencoder_params(checkpoint_path, model, ae_def)
    return model, variables


def default_eval_output_dir(config_file: str, root_dir: str = "evals") -> Path:
    """``<root_dir>/<config_stem>/`` (reference ``vae_loader.py:46-57``)."""
    return Path(root_dir) / Path(config_file).stem


# re-export for cli convenience
load_config = load_config
