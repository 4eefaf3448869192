"""VAE evaluation CLI: stochastic forward + full metric suite -> metrics.json.

Workload parity with ``vae_scripts/evaluate_vae.py`` (SURVEY.md §3.3):
per batch — stochastic forward, recon/KL/perceptual losses; per sample —
PSNR/SSIM/MSE/MAE on [0,1]-clamped images; aggregate mean/std written to
``metrics.json``. Note: the reference composes ``loss_total`` without
``kl_weight`` here (KL at weight 1.0, ``evaluate_vae.py:100`` — documented
inconsistency, SURVEY.md §2.4.6); reproduced for parity.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lpips import lpips_distance_per_sample_3d, load_lpips_params, lpips_distance_per_sample
from ..utils.cli_common import (
    add_shared_io_args,
    build_inference_dataloader,
    init_device_and_seed,
    load_config_and_model,
    resolve_eval_output_dir,
    serialize_args,
)
from ..utils.eval_metrics import compute_mae, compute_mse, compute_psnr, compute_ssim

__all__ = ["main", "evaluate"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Evaluate a trained VAE on a test set (TPU).")
    add_shared_io_args(
        parser, output_help="Output directory for metrics (default: evals/<config_name>/)"
    )
    parser.add_argument("--f32", action="store_true",
                        help="Exact f32 numerics (HIGHEST matmul precision, "
                             "XLA attention) — required for reference-parity "
                             "measurements on TPU")
    return parser.parse_args(argv)


def evaluate(model, variables, dataloader, *, recon_kind: str,
             perceptual_weight: float, lpips_params, seed: int = 42) -> dict[str, float]:
    def _masked_mean(per_sample, mask):
        return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def eval_batch(params, images, mask, rng):
        recon, z_mu, z_sigma = model.apply(params, images, rng)
        recon_c = jnp.clip(recon, 0.0, 1.0)
        images_c = jnp.clip(images, 0.0, 1.0)
        # Batch metrics as masked means so zero-padded samples (static batch
        # shapes) never contaminate the aggregates.
        diff = recon.astype(jnp.float32) - images.astype(jnp.float32)
        per = jnp.abs(diff) if recon_kind != "l2" else jnp.square(diff)
        # reductions over all non-batch axes: rank-generic (3-D models too)
        intensity = _masked_mean(jnp.mean(per, axis=tuple(range(1, per.ndim))), mask)
        sec = z_sigma.astype(jnp.float32)
        kl_ps = -0.5 * jnp.sum(
            1.0 + sec - jnp.square(z_mu.astype(jnp.float32)) - jnp.exp(sec),
            axis=tuple(range(1, sec.ndim)),
        )  # reference objective: sigma-as-logvar (SURVEY.md §2.4.1)
        kl = _masked_mean(kl_ps, mask)
        # 5-D (NDHWC) reconstructions take the fake-3D slicing path
        lpips_fn = (lpips_distance_per_sample_3d if recon.ndim == 5
                    else lpips_distance_per_sample)
        perc = _masked_mean(lpips_fn(lpips_params, recon, images), mask)
        total = intensity + kl + perceptual_weight * perc  # no kl_weight (parity)
        return {
            "recon_loss": intensity,
            "kl_loss": kl,
            "perceptual_loss": perc,
            "loss_total": total,
            "psnr": compute_psnr(recon_c, images_c),
            "ssim": compute_ssim(recon_c, images_c),
            "mse": compute_mse(recon_c, images_c),
            "mae": compute_mae(recon_c, images_c),
        }

    metrics: dict[str, list[float]] = {k: [] for k in
        ("recon_loss", "kl_loss", "perceptual_loss", "psnr", "ssim", "loss_total", "mse", "mae")}
    key = jax.random.key(seed)
    for batch in dataloader:
        key, sub = jax.random.split(key)
        out = eval_batch(variables, jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]), sub)
        valid = int(batch["mask"].sum())
        for name in ("recon_loss", "kl_loss", "perceptual_loss", "loss_total"):
            metrics[name].append(float(out[name]))
        for name in ("psnr", "ssim", "mse", "mae"):
            metrics[name].extend(np.asarray(out[name])[:valid].tolist())

    summary: dict[str, float] = {}
    for key_name, values in metrics.items():
        if values:
            summary[f"{key_name}_mean"] = float(np.mean(values))
            summary[f"{key_name}_std"] = float(np.std(values))
    return summary


def main(argv=None) -> None:
    args = parse_args(argv)
    init_device_and_seed(args.seed)
    config, (model, variables) = load_config_and_model(
        args.config_file, args.checkpoint, exact=args.f32
    )
    output_dir = resolve_eval_output_dir(args.config_file, args.output_dir)
    dataloader, image_paths = build_inference_dataloader(
        input_dir=args.input_dir, config=config, batch_size=args.batch_size,
        num_samples=args.num_samples, num_workers=args.num_workers,
    )
    print(f"[INFO] Found {len(image_paths)} images in {args.input_dir}")
    from ..models.lpips import lpips_is_pretrained

    lpips_params = load_lpips_params()
    summary = evaluate(
        model, variables, dataloader,
        recon_kind=config.autoencoder_train.get("recon_loss", "l1"),
        perceptual_weight=config.autoencoder_train["perceptual_weight"],
        lpips_params=lpips_params,
        seed=args.seed,
    )
    payload = {
        "args": serialize_args(args),
        "metrics": summary,
        "perceptual_pretrained": lpips_is_pretrained(lpips_params),
        "files": image_paths,
    }
    with open(Path(output_dir) / "metrics.json", "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2)
    print("\n=== Evaluation Summary ===")
    for key_name, value in summary.items():
        print(f"{key_name}: {value:.4f}")
    print(f"\nMetrics saved to {Path(output_dir) / 'metrics.json'}")


if __name__ == "__main__":
    main()
