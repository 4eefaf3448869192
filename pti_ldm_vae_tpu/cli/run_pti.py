"""Pivotal-tuning-inversion CLI: per-image latent inversion + decoder
fine-tune on a trained VAE (the PTI stage of PTI-LDM-VAE; SURVEY.md §7.9).

For each input image: stage 1 optimizes a pivot latent through the frozen
decoder to reconstruct the image; stage 2 fine-tunes the decoder around that
pivot. Outputs per image: pivot latent (.npz), reconstruction TIF/PNG, and
the tuned decoder params (orbax) when ``--save-tuned``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..checkpoint.orbax_io import save_pytree
from ..data.factory import create_vae_inference_dataloader
from ..data.io import write_png, write_tif
from ..train.diffusion import pivotal_tuning_inversion
from ..utils.cli_common import (
    add_shared_io_args,
    init_device_and_seed,
    load_config_and_model,
)
from ..utils.visualization import normalize_batch_for_display

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Pivotal tuning inversion (TPU).")
    add_shared_io_args(parser, output_help="Output directory (default: pti_out)")
    parser.add_argument("--latent-steps", type=int, default=200)
    parser.add_argument("--latent-lr", type=float, default=1e-1)
    parser.add_argument("--tune-steps", type=int, default=100)
    parser.add_argument("--tune-lr", type=float, default=1e-4)
    parser.add_argument("--save-tuned", action="store_true",
                        help="Save per-image tuned decoder params (large)")
    return parser.parse_args(argv)


def main(argv=None) -> Path:
    args = parse_args(argv)
    init_device_and_seed(args.seed)
    config, (model, variables) = load_config_and_model(args.config_file, args.checkpoint)
    out_dir = Path(args.output_dir or "pti_out")
    out_dir.mkdir(parents=True, exist_ok=True)

    patch_size = tuple(config.autoencoder_train["patch_size"])
    loader, paths = create_vae_inference_dataloader(
        args.input_dir, patch_size, batch_size=1,
        num_samples=args.num_samples, num_workers=args.num_workers,
    )

    def decode_fn(params, z):
        return model.apply(params, z, method=model.decode_stage_2_outputs)

    img_idx = 0
    for batch in loader:
        if batch["mask"][0] == 0:
            continue
        target = jnp.asarray(batch["image"][:1])
        # Encoder gives the starting point for inversion.
        z_init = model.apply(variables, target, method=model.encode_deterministic)
        pivot, tuned, losses = pivotal_tuning_inversion(
            decode_fn, variables, target, z_init,
            latent_steps=args.latent_steps, latent_lr=args.latent_lr,
            tune_steps=args.tune_steps, tune_lr=args.tune_lr,
        )
        recon = np.asarray(decode_fn(tuned, pivot))
        name = Path(paths[img_idx]).stem
        np.savez(out_dir / f"{name}_pivot.npz", latent=np.asarray(pivot),
                 latent_loss=np.asarray(losses["latent"]),
                 tune_loss=np.asarray(losses["tune"]))
        write_tif(str(out_dir / f"{name}_pti.tif"), recon[0, :, :, 0])
        disp = normalize_batch_for_display(recon)
        write_png(str(out_dir / f"{name}_pti.png"), (disp[0, :, :, 0] * 255).astype(np.uint8))
        if args.save_tuned:
            save_pytree(str(out_dir / f"{name}_decoder"), tuned)
        print(f"{name}: inversion L2 {float(losses['latent'][-1]):.5f} -> "
              f"tuned {float(losses['tune'][-1]):.5f}")
        img_idx += 1
    print(f"PTI complete ({img_idx} images) -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
