"""DDIM sampling CLI: trained UNet -> latents -> frozen VAE decode -> images.

The full sampling loop (all DDIM steps + decode) is one on-device program
(``lax.scan``, SURVEY.md §7.9 north star). With conditioning enabled, a
directory of condition images drives the context; otherwise sampling is
unconditional.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.orbax_io import load_pytree
from ..config import load_config, resolve_bool
from ..data.factory import create_vae_inference_dataloader
from ..data.io import write_png, write_tif
from ..ops.norm import DEFAULT_NORM_STATS
from ..models.unet import ConditionProjector, diffusion_unet_from_config
from ..train.diffusion import NoiseSchedule, ddim_sample
from ..utils.cli_common import init_device_and_seed
from ..utils.vae_loader import load_vae_config, load_vae_model
from ..utils.visualization import normalize_batch_for_display

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Sample images with DDIM (TPU).")
    parser.add_argument("-c", "--config-file", required=True, help="LDM config JSON")
    parser.add_argument("--checkpoint", required=True, help="Diffusion orbax checkpoint dir")
    parser.add_argument("--output-dir", default="ddim_samples")
    parser.add_argument("--num-images", type=int, default=8)
    parser.add_argument("--num-inference-steps", type=int, default=None)
    parser.add_argument("--condition-dir", default=None,
                        help="Images whose latents condition the sampler")
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None) -> Path:
    args = parse_args(argv)
    cfg = load_config(args.config_file)
    rng = init_device_and_seed(args.seed)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    vae_cfg = load_vae_config(cfg["vae"]["config_file"])
    vae, vae_vars = load_vae_model(vae_cfg, cfg["vae"]["checkpoint"])
    if getattr(vae, "spatial_dims", 2) != 2:
        # Latent bookkeeping below assumes 2-D (h_lat, w_lat) and the dump
        # path slices [i, :, :, 0]; reject volumes loudly.
        raise NotImplementedError(
            "sample_diffusion supports spatial_dims=2 VAEs only "
            f"(got spatial_dims={vae.spatial_dims})"
        )
    patch_size = tuple(vae_cfg.autoencoder_train["patch_size"])
    # honor the same top-level "remat" placement train_diffusion uses (the
    # sampler is forward-only so it is a no-op for memory, but the flag must
    # not silently diverge between train and sample graphs)
    unet = diffusion_unet_from_config(
        cfg["diffusion_def"],
        compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
        remat=resolve_bool(cfg.get("remat", cfg["diffusion_def"].get("remat", False))),
        norm_stats=str(cfg.get(
            "norm_stats", cfg["diffusion_def"].get("norm_stats", DEFAULT_NORM_STATS))),
    )
    with_cond = cfg["diffusion_def"].get("with_conditioning", True)
    latent_ch = cfg["diffusion_def"]["in_channels"]
    schedule = NoiseSchedule.linear_beta(
        int(cfg["diffusion_train"].get("num_train_timesteps", 1000)),
        float(cfg["diffusion_train"].get("beta_start", 1e-4)),
        float(cfg["diffusion_train"].get("beta_end", 2e-2)),
    )
    steps = args.num_inference_steps or int(cfg.get("sampling", {}).get("num_inference_steps", 50))
    eta = float(cfg.get("sampling", {}).get("eta", 0.0))

    # Mesh over all devices: the sample batch shards on `data`, every
    # parameter tree replicates explicitly (checkpoint-restored arrays carry
    # committed shardings that would otherwise clash with fresh arrays).
    from ..parallel.mesh import make_mesh, place_batch, replicated

    mesh = make_mesh()
    params = jax.device_put(load_pytree(args.checkpoint), replicated(mesh))
    vae_vars = jax.device_put(vae_vars, replicated(mesh))
    projector = ConditionProjector(
        cross_attention_dim=cfg["diffusion_def"].get("cross_attention_dim", 512)
    ) if with_cond else None

    latent_shape = jax.eval_shape(
        lambda v, x: vae.apply(v, x, method=vae.encode_deterministic),
        vae_vars, jax.ShapeDtypeStruct((1, *patch_size, vae.in_channels), jnp.float32),
    ).shape
    h_lat, w_lat = latent_shape[1], latent_shape[2]

    context = None
    if with_cond:
        if args.condition_dir is None:
            raise ValueError("with_conditioning=true requires --condition-dir")
        loader, cond_paths = create_vae_inference_dataloader(
            args.condition_dir, patch_size, args.num_images, num_samples=args.num_images
        )
        batch = next(iter(loader))
        cond_lat = vae.apply(vae_vars, jnp.asarray(batch["image"]),
                             method=vae.encode_deterministic)
        tokens = cond_lat.reshape(cond_lat.shape[0], -1, latent_ch)
        context = projector.apply(params["projector"], tokens)
        n = context.shape[0]
    else:
        n = args.num_images

    def apply(p, x, t, ctx):
        return unet.apply(p, x, t, ctx)

    # Shard the sample batch over the mesh `data` axis — each chip denoises
    # its samples independently (params replicated, no collectives in the
    # scan). Batch is padded to the device count (extra rows dropped after
    # decode); single-device meshes degrade to the plain path.
    rng, noise_rng = jax.random.split(rng)
    noise_host = np.asarray(
        jax.random.normal(noise_rng, (n, h_lat, w_lat, latent_ch), jnp.float32)
    )
    placed = place_batch(
        mesh,
        {"noise": noise_host, **({"ctx": np.asarray(context)} if context is not None else {})},
    )
    initial_noise = placed["noise"]
    context = placed.get("ctx", None)
    n_padded = initial_noise.shape[0]

    @jax.jit
    def sample_and_decode(p, vv, rng, noise, ctx):
        latents = ddim_sample(
            lambda pp, x, t, c: apply(pp, x, t, c), p["unet"], schedule,
            (n_padded, h_lat, w_lat, latent_ch), rng,
            num_inference_steps=steps, context=ctx, eta=eta,
            initial_noise=noise,
        )
        return vae.apply(vv, latents, method=vae.decode_stage_2_outputs)

    images = np.asarray(
        sample_and_decode(params, vae_vars, rng, initial_noise, context)
    )[:n]
    disp = normalize_batch_for_display(images)
    for i in range(images.shape[0]):
        write_tif(str(out_dir / f"sample_{i:03d}.tif"), images[i, :, :, 0])
        write_png(str(out_dir / f"sample_{i:03d}.png"),
                  (disp[i, :, :, 0] * 255).astype(np.uint8))
    print(f"Wrote {images.shape[0]} samples to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
