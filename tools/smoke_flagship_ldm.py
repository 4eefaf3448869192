#!/usr/bin/env python
"""Flagship-scale LDM smoke on real hardware (VERDICT round-2 item 2).

Round-2 TPU smokes used a toy UNet (channels [8,16]); this drives the FULL
``ldm_dente.json`` stage — UNet channels [32,64,128,256], cross-attention
512, conditioned on 32² latents — end to end through the real CLIs:

1. build a flagship-architecture VAE checkpoint (vae_dente_no_adv def) and
   a synthetic 256² dente dataset,
2. ``train_diffusion`` for one epoch at batch 8 (flagship UNet, jitted
   eps-MSE step, donated state),
3. ``sample_diffusion`` — 50 DDIM steps, conditioned, one on-device scan,
4. ``run_pti --batch-size 4`` — vmapped+sharded two-stage PTI.

Prints a JSON line per stage with wall-clock. Run with the TPU visible:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_flagship_ldm.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", type=int, default=16)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--pti-steps", type=int, default=30,
                        help="latent/tune steps for the PTI stage (full 200/100 is minutes)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        # TPU-only: foreign-host CPU AOT cache entries are a SIGILL risk
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
    from pti_ldm_vae_tpu.config import load_config
    from pti_ldm_vae_tpu.data.io import write_tif
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config

    work = args.workdir or tempfile.mkdtemp(prefix="ldm_smoke_")
    os.makedirs(work, exist_ok=True)
    os.chdir(work)

    # -- synthetic dataset + flagship VAE checkpoint ----------------------
    data_dir = os.path.join(work, "data", "dente")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(args.images):
        img = rng.uniform(0.1, 1.0, size=(256, 256)).astype(np.float32)
        img[:20] = 0.0
        write_tif(os.path.join(data_dir, f"dente_{i:03d}.tif"), img)

    vae_cfg = load_config("/root/repo/config/vae_dente_no_adv.json")
    vae_cfg["data_base_dir"] = os.path.join(work, "data")
    vae_cfg_path = os.path.join(work, "vae_cfg.json")
    with open(vae_cfg_path, "w", encoding="utf-8") as fh:
        json.dump(vae_cfg, fh)

    model = autoencoder_from_config(vae_cfg["autoencoder_def"])
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 256, 256, 1), jnp.float32), jax.random.key(1)
    )
    vae_ckpt = os.path.join(work, "vae_ckpt")
    save_pytree(vae_ckpt, variables)

    ldm_cfg = load_config("/root/repo/config/ldm_dente.json")
    ldm_cfg["run_dir"] = os.path.join(work, "runs", "ldm")
    ldm_cfg["vae"] = {"config_file": vae_cfg_path, "checkpoint": vae_ckpt}
    ldm_cfg["diffusion_train"]["max_epochs"] = 1
    ldm_cfg_path = os.path.join(work, "ldm_cfg.json")
    with open(ldm_cfg_path, "w", encoding="utf-8") as fh:
        json.dump(ldm_cfg, fh)

    # -- 1. flagship diffusion training -----------------------------------
    from pti_ldm_vae_tpu.cli.train_diffusion import main as train_main

    t0 = time.time()
    result = train_main([
        "-c", ldm_cfg_path, "--input-dir", data_dir, "--max-epochs", "1",
        "--num-workers", "2",
    ])
    print(json.dumps({
        "stage": "train_diffusion", "arch": "ldm_dente [32,64,128,256] xattn512",
        "epochs": 1, "images": args.images, "batch": 8,
        "wall_s": round(time.time() - t0, 1),
        "final_eps_mse": float(result.get("final_loss", float("nan")))
        if isinstance(result, dict) else None,
    }), flush=True)

    ckpt = os.path.join(ldm_cfg["run_dir"], "trained_weights", "diffusion_last")

    # -- 2. conditioned DDIM sampling -------------------------------------
    from pti_ldm_vae_tpu.cli.sample_diffusion import main as sample_main

    t0 = time.time()
    out_dir = sample_main([
        "-c", ldm_cfg_path, "--checkpoint", ckpt,
        "--output-dir", os.path.join(work, "samples"), "--num-images", "4",
        "--condition-dir", data_dir,
    ])
    n_samples = len([f for f in os.listdir(out_dir) if f.endswith(".tif")])
    print(json.dumps({
        "stage": "sample_diffusion", "ddim_steps": 50, "samples": n_samples,
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)

    # -- 3. batched PTI ----------------------------------------------------
    from pti_ldm_vae_tpu.cli.run_pti import main as pti_main

    t0 = time.time()
    pti_dir = pti_main([
        "-c", vae_cfg_path, "--checkpoint", vae_ckpt,
        "--input-dir", data_dir, "--output-dir", os.path.join(work, "pti"),
        "--batch-size", "4", "--num-samples", "4",
        "--latent-steps", str(args.pti_steps), "--tune-steps", str(args.pti_steps),
    ])
    n_pti = len([f for f in os.listdir(pti_dir) if f.endswith("_pti.tif")])
    print(json.dumps({
        "stage": "run_pti_batched", "batch": 4, "images": n_pti,
        "latent_steps": args.pti_steps, "tune_steps": args.pti_steps,
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)
    print(json.dumps({"stage": "done", "workdir": work}), flush=True)


if __name__ == "__main__":
    main()
