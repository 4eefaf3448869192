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

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.orbax_io import save_pytree
from ..data.factory import create_vae_inference_dataloader
from ..data.io import write_png, write_tif
from ..ops.space_to_depth import s2d_auto_mode
from ..parallel.mesh import make_mesh, place_batch
from ..train.diffusion import (
    make_pivotal_tuning_inversion_batched,
    pivotal_tuning_inversion,
)
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
    parser.add_argument("--tune-formulation", choices=("scan", "vmap"),
                        default="scan",
                        help="Batched tune stage: 'scan' holds one image's "
                             "decoder params live at a time (linear scaling, "
                             "default); 'vmap' is the legacy per-image-copies "
                             "path kept for A/B")
    # --batch-size comes from add_shared_io_args: >1 vmaps the whole PTI
    # stage and shards it over the device mesh (each chip tunes its images
    # independently); 1 keeps the sequential per-image path.
    parser.set_defaults(batch_size=1)
    return parser.parse_args(argv)


def main(argv=None) -> Path:
    args = parse_args(argv)
    init_device_and_seed(args.seed)
    # PTI DIFFERENTIATES through the decoder (inversion wrt z, tune wrt
    # decoder params), so the inference-profile s2d "auto" is wrong here —
    # resolve from the measured train table instead (decoder transforms'
    # backward transposes are the same cost class as training's).
    config, (model, variables) = load_config_and_model(
        args.config_file, args.checkpoint,
        s2d_stem=s2d_auto_mode("train", max(args.batch_size, 1)))
    if getattr(model, "spatial_dims", 2) != 2:
        # The TIF/PNG dump path slices [0, :, :, 0] (2-D NHWC); a volume
        # checkpoint would silently write a malformed [D,H,C] slice.
        raise NotImplementedError(
            "run_pti supports spatial_dims=2 checkpoints only "
            f"(got spatial_dims={model.spatial_dims})"
        )
    out_dir = Path(args.output_dir or "pti_out")
    out_dir.mkdir(parents=True, exist_ok=True)

    patch_size = tuple(config.autoencoder_train["patch_size"])
    loader, paths = create_vae_inference_dataloader(
        args.input_dir, patch_size, batch_size=max(args.batch_size, 1),
        num_samples=args.num_samples, num_workers=args.num_workers,
    )

    def decode_fn(params, z):
        return model.apply(params, z, method=model.decode_stage_2_outputs)

    hyper = dict(
        latent_steps=args.latent_steps, latent_lr=args.latent_lr,
        tune_steps=args.tune_steps, tune_lr=args.tune_lr,
        tune_formulation=args.tune_formulation,
    )
    batched = args.batch_size > 1
    mesh = None
    if batched and jax.device_count() > 1:
        # Each image's optimization is independent: shard the batch over the
        # mesh `data` axis and every chip runs its images concurrently.
        # Params replicate explicitly (checkpoint-restored arrays may be
        # committed to one device, which would clash with sharded inputs).
        from ..parallel.mesh import replicated

        mesh = make_mesh()
        variables = jax.device_put(variables, replicated(mesh))
    # Build the vmapped PTI program ONCE; the returned callable carries the
    # jit cache across batches (rebuilding per batch re-traces a program
    # whose remote compile takes minutes on a TPU tunnel).
    batched_program = (
        make_pivotal_tuning_inversion_batched(decode_fn, mesh=mesh, **hyper)
        if batched else None
    )

    def save_one(name: str, pivot, tuned, latent_loss, tune_loss) -> None:
        recon = np.asarray(decode_fn(tuned, pivot))
        np.savez(out_dir / f"{name}_pivot.npz", latent=np.asarray(pivot),
                 latent_loss=np.asarray(latent_loss), tune_loss=np.asarray(tune_loss))
        write_tif(str(out_dir / f"{name}_pti.tif"), recon[0, :, :, 0])
        disp = normalize_batch_for_display(recon)
        write_png(str(out_dir / f"{name}_pti.png"), (disp[0, :, :, 0] * 255).astype(np.uint8))
        if args.save_tuned:
            save_pytree(str(out_dir / f"{name}_decoder"), tuned)
        print(f"{name}: inversion L2 {float(latent_loss[-1]):.5f} -> "
              f"tuned {float(tune_loss[-1]):.5f}")

    img_idx = 0
    for batch in loader:
        valid = np.asarray(batch["mask"]) > 0
        if not valid.any():
            continue
        images = jnp.asarray(batch["image"])
        z_init = model.apply(variables, images, method=model.encode_deterministic)
        if batched:
            target_in, z_in = images, z_init
            if mesh is not None:
                placed = place_batch(mesh, {"image": np.asarray(images),
                                            "z": np.asarray(z_init)})
                target_in, z_in = placed["image"], placed["z"]
            pivots, tuned_all, losses = batched_program(variables, target_in, z_in)
            for row in np.nonzero(valid)[0]:
                name = Path(paths[img_idx + int(row)]).stem
                tuned_row = jax.tree.map(lambda leaf, r=int(row): leaf[r], tuned_all)
                save_one(name, pivots[int(row)][None], tuned_row,
                         losses["latent"][int(row)], losses["tune"][int(row)])
        else:
            target = images[:1]
            # the single-image path has no batch axis — no formulation knob
            seq_hyper = {k: v for k, v in hyper.items() if k != "tune_formulation"}
            pivot, tuned, losses = pivotal_tuning_inversion(
                decode_fn, variables, target, z_init[:1], **seq_hyper
            )
            name = Path(paths[img_idx]).stem
            save_one(name, pivot, tuned, losses["latent"], losses["tune"])
        img_idx += int(valid.sum())
    print(f"PTI complete ({img_idx} images) -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
