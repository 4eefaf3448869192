"""Shared CLI plumbing (reference ``utils/cli_common.py``)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any

import jax

from ..data.factory import create_vae_inference_dataloader
from .determinism import set_determinism
from .vae_loader import default_eval_output_dir, load_vae_config, load_vae_model

__all__ = [
    "add_shared_io_args",
    "init_device_and_seed",
    "load_config_and_model",
    "build_inference_dataloader",
    "resolve_inference_output_dirs",
    "resolve_eval_output_dir",
    "load_json_config",
    "resolve_run_dir",
    "serialize_args",
]


def add_shared_io_args(parser: argparse.ArgumentParser, output_help: str) -> None:
    """Common IO arguments (reference ``cli_common.py:16-37``)."""
    parser.add_argument("-c", "--config-file", required=True, help="Config json file")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Checkpoint path (orbax dir or torch .pth)")
    parser.add_argument("--input-dir", type=str, required=True,
                        help="Directory containing input TIF images")
    parser.add_argument("--output-dir", type=str, default=None, help=output_help)
    parser.add_argument("--num-samples", type=int, default=None,
                        help="Number of samples to process (default: all)")
    parser.add_argument("--batch-size", type=int, default=8, help="Batch size (default: 8)")
    parser.add_argument("--num-workers", type=int, default=4,
                        help="Number of loader workers (default: 4)")
    parser.add_argument("--seed", type=int, default=42,
                        help="Random seed for determinism (default: 42)")


def init_device_and_seed(seed: int | None):
    """Report devices + seed (reference ``cli_common.py:40-54``); returns the
    root PRNG key."""
    print(f"Using JAX backend: {jax.default_backend()} ({jax.device_count()} devices)")
    return set_determinism(seed)


def enable_parity_numerics() -> None:
    """Exact-f32 numerics for parity runs against the torch reference.

    TPUs execute f32 matmuls/convs at bf16 precision under the DEFAULT
    policy (measured ~2.7e-2 recon divergence); forcing HIGHEST restores true
    f32 (~5e-6). Pair with ``exact=True`` model loading.
    """
    jax.config.update("jax_default_matmul_precision", "highest")


def load_config_and_model(
    config_file: str, checkpoint_path: str, *, compute_dtype=None, exact: bool = False,
    s2d_stem=None,
):
    """Reference ``cli_common.py:57-70``: returns (config_namespace, (model, params)).

    ``exact=True``: f32 compute, HIGHEST matmul precision, XLA attention —
    the numerics the <=1e-3 reference-parity bar is measured under.
    """
    import jax.numpy as jnp

    if exact:
        enable_parity_numerics()
        compute_dtype = jnp.float32
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    config = load_vae_config(config_file)
    # exact mode pins the standard (reference) formulation: s2d reorders
    # fp contractions, which would eat into the <=1e-3 parity margin
    model, variables = load_vae_model(
        config, checkpoint_path, compute_dtype=compute_dtype,
        use_pallas_attention=False if exact else None,
        s2d_stem=False if exact else s2d_stem,
    )
    return config, (model, variables)


def build_inference_dataloader(
    input_dir: str, config: Any, batch_size: int, num_samples: int | None, num_workers: int
):
    patch_size = tuple(config.autoencoder_train["patch_size"])
    return create_vae_inference_dataloader(
        input_dir=input_dir, patch_size=patch_size, batch_size=batch_size,
        num_samples=num_samples, num_workers=num_workers,
    )


def resolve_inference_output_dirs(
    checkpoint_path: str, output_dir: str | None
) -> tuple[Path, Path, Path]:
    """Reference ``cli_common.py:102-134``."""
    checkpoint_name = Path(checkpoint_path).stem or Path(checkpoint_path).name
    base = Path(f"inference_vae_{checkpoint_name}") if output_dir is None else Path(output_dir)
    out_tif = base / "results_tif"
    out_png = base / "results_png"
    out_tif.mkdir(parents=True, exist_ok=True)
    out_png.mkdir(parents=True, exist_ok=True)
    return base, out_tif, out_png


def resolve_eval_output_dir(config_file: str, output_dir: str | None) -> Path:
    out = Path(output_dir) if output_dir is not None else default_eval_output_dir(config_file)
    out.mkdir(parents=True, exist_ok=True)
    return out


def load_json_config(config_file: str) -> dict[str, Any]:
    """Plain JSON load, no @refs (regression configs, ``cli_common.py:137-147``)."""
    with open(config_file, encoding="utf-8") as fh:
        return json.load(fh)


def resolve_run_dir(config: dict[str, Any], config_file: str) -> Path:
    """``runs/<config_stem>`` default (reference ``cli_common.py:150-166``)."""
    if config.get("run_dir"):
        run_dir = Path(config["run_dir"])
    else:
        run_dir = Path("runs") / Path(config_file).stem
        config["run_dir"] = str(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def serialize_args(args: Any) -> dict[str, Any]:
    """CLI args -> JSON-serializable (reference ``eval_metrics.py:66-83``)."""
    out: dict[str, Any] = {}
    for key, value in vars(args).items():
        if hasattr(value, "__fspath__"):
            out[key] = str(value)
        elif isinstance(value, (list, tuple)):
            out[key] = [str(item) for item in value]
        else:
            out[key] = value
    return out
