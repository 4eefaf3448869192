"""Latent-diffusion training CLI (the reference's dormant stage 2, first-class
here per the north star — SURVEY.md §0).

Pipeline: frozen VAE encodes images to sampled latents
(``encode_stage_2_inputs``), the UNet learns epsilon-prediction on them;
optional latent-conditioning projects deterministic latents to cross-attention
context tokens. One jitted step (encode + noise + UNet fwd/bwd + Adam).
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from ..checkpoint.orbax_io import save_pytree
from ..config import load_config, resolve_bool
from ..data.factory import create_vae_inference_dataloader
from ..ops.norm import DEFAULT_NORM_STATS
from ..models.unet import ConditionProjector, diffusion_unet_from_config
from ..parallel.mesh import make_mesh, place_batch
from ..train.diffusion import NoiseSchedule, add_noise
from ..utils.cli_common import init_device_and_seed
from ..utils.logging import MetricLogger
from ..utils.vae_loader import load_vae_config, load_vae_model

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train a latent diffusion UNet (TPU).")
    parser.add_argument("-c", "--config-file", required=True, help="LDM config JSON")
    parser.add_argument("--input-dir", required=True, help="Training image directory")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--remat", action="store_true",
                        help="Force activation checkpointing on the UNet "
                             "(equivalent to top-level \"remat\": true in the "
                             "config) — trades ~one extra forward for block "
                             "activation memory")
    return parser.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    cfg = load_config(args.config_file)
    rng = init_device_and_seed(args.seed)
    run_dir = Path(cfg.get("run_dir", "./runs/ldm"))
    weights_dir = run_dir / "trained_weights"
    weights_dir.mkdir(parents=True, exist_ok=True)

    # frozen VAE
    vae_cfg = load_vae_config(cfg["vae"]["config_file"])
    vae, vae_vars = load_vae_model(vae_cfg, cfg["vae"]["checkpoint"])
    patch_size = tuple(vae_cfg.autoencoder_train["patch_size"])

    train_cfg = cfg["diffusion_train"]
    batch_size = args.batch_size or int(train_cfg["batch_size"])
    max_epochs = args.max_epochs or int(train_cfg["max_epochs"])

    # Activation checkpointing: top-level "remat" (documented placement, same
    # as the VAE's), a legacy diffusion_def-level key, or the --remat flag.
    remat = bool(args.remat) or resolve_bool(
        cfg.get("remat", cfg["diffusion_def"].get("remat", False)))
    norm_stats = str(cfg.get(
        "norm_stats", cfg["diffusion_def"].get("norm_stats", DEFAULT_NORM_STATS)))
    unet = diffusion_unet_from_config(
        cfg["diffusion_def"],
        compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
        remat=remat,
        norm_stats=norm_stats,
    )
    with_cond = cfg["diffusion_def"].get("with_conditioning", True)
    cross_dim = cfg["diffusion_def"].get("cross_attention_dim", 512)
    latent_ch = cfg["diffusion_def"]["in_channels"]
    schedule = NoiseSchedule.linear_beta(
        int(train_cfg.get("num_train_timesteps", 1000)),
        float(train_cfg.get("beta_start", 1e-4)),
        float(train_cfg.get("beta_end", 2e-2)),
    )

    loader, paths = create_vae_inference_dataloader(
        args.input_dir, patch_size, batch_size,
        num_samples=args.num_samples, num_workers=args.num_workers,
    )
    print(f"[INFO] {len(paths)} training images")

    # init with latent shapes inferred abstractly
    latent_shape = jax.eval_shape(
        lambda v, x: vae.apply(v, x, method=vae.encode_deterministic),
        vae_vars, jax.ShapeDtypeStruct((1, *patch_size, vae.in_channels), jnp.float32),
    ).shape
    h_lat, w_lat = latent_shape[1], latent_shape[2]

    init_rng, rng = jax.random.split(rng)
    params = {"unet": unet.init(
        init_rng, jnp.zeros((1, h_lat, w_lat, latent_ch)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, h_lat * w_lat, cross_dim)) if with_cond else None,
    )}
    projector = None
    if with_cond:
        projector = ConditionProjector(cross_attention_dim=cross_dim)
        params["projector"] = projector.init(
            jax.random.key(1), jnp.zeros((1, h_lat * w_lat, latent_ch))
        )
    tx = optax.adam(float(train_cfg["lr"]))
    opt_state = tx.init(params)

    # donate (params, opt_state): the loop reassigns both, so XLA updates
    # the optimizer state in place instead of allocating a second copy.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, mask, rng):
        rng_enc, rng_t, rng_noise = jax.random.split(rng, 3)
        latents = vae.apply(vae_vars, images, rng_enc, method=vae.encode_stage_2_inputs)
        cond = vae.apply(vae_vars, images, method=vae.encode_deterministic) if with_cond else None

        def loss_fn(p):
            b = latents.shape[0]
            timesteps = jax.random.randint(rng_t, (b,), 0, schedule.num_train_timesteps)
            noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
            noisy = add_noise(schedule, latents, noise, timesteps)
            ctx = None
            if with_cond:
                tokens = cond.reshape(b, -1, latent_ch)
                ctx = projector.apply(p["projector"], tokens)
            eps = unet.apply(p["unet"], noisy, timesteps, ctx)
            per = jnp.mean(jnp.square(eps - noise), axis=(1, 2, 3))
            return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Data-parallel mesh over all devices (DDP equivalent): batch rows shard
    # on `data`, params replicate, XLA inserts the gradient all-reduce over
    # ICI inside the jitted step.
    mesh = make_mesh()

    logger = MetricLogger(str(run_dir), wandb_cfg=cfg.get("wandb", {"enabled": False}))
    total_step = 0
    for epoch in range(max_epochs):
        loader.set_epoch(epoch)
        # loss accumulates ON DEVICE (float() per step would serialize
        # dispatch — same discipline as the VAE train loop)
        epoch_loss, n = None, 0
        for batch in loader:
            rng, sub = jax.random.split(rng)
            placed = place_batch(mesh, {"image": batch["image"], "mask": batch["mask"]})
            params, opt_state, loss = step(
                params, opt_state, placed["image"], placed["mask"], sub
            )
            epoch_loss = loss if epoch_loss is None else epoch_loss + loss
            n += 1
            total_step += 1
        mean_loss = float(epoch_loss) / max(n, 1) if epoch_loss is not None else 0.0
        print(f"Epoch {epoch}: eps-MSE {mean_loss:.5f}")
        logger.log({"train/eps_mse": mean_loss, "epoch": epoch}, step=total_step)
        save_pytree(str(weights_dir / "diffusion_last"), params)
    logger.finish()
    return {"final_loss": mean_loss, "weights_dir": str(weights_dir)}


if __name__ == "__main__":
    main()
