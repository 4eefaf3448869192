"""Remat A/B on the flagship VAE train step (1x v5e).

A: remat=False (shipped default) at b128 — sanity row against BENCH.
B: remat=True at b128 (the remat tax), then b192/b256 (batches whose
   stored-activation backward OOM'd in round 2).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import bench

bench.setup_platform()
n_ok = 0
n_failed = 0
from __graft_entry__ import FLAGSHIP_CONFIG as config
from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
from pti_ldm_vae_tpu.models.lpips import init_lpips_params
from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

peak_tf, peak_bw = 197.0, 819.0
lpips_params = init_lpips_params()
lcfg = LossConfig(
    recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
    adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True,
)

for remat in (False, True):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, remat=remat)

    def make_step():
        return make_train_step(model, None, lcfg, adv_active=False, donate=True)

    for b in ((128,) if not remat else (128, 192, 256)):
        try:
            res = bench.bench_train(model, lpips_params, make_step, b, peak_tf, peak_bw)
            print(json.dumps({"row": "train", "remat": remat, "batch": b, **res}),
                  flush=True)
            n_ok += 1
        except Exception as exc:
            # capacity failures at the probe batches are expected findings
            # (b192/b256 were chosen BECAUSE they OOM'd without remat);
            # anything else is a real failure the queue must retry
            if not bench._is_memory_failure(exc):
                n_failed += 1
            print(f"# train remat={remat} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)

# PTI under remat: inversion is decoder fwd+bwd; remat may unlock larger
# batches than the round-2 32/64 probes.
model_r = autoencoder_from_config(config, compute_dtype=jnp.bfloat16, remat=True)
params = jax.jit(model_r.init)(
    jax.random.key(0), jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32),
    jax.random.key(1))
for b in (64, 128):
    try:
        res = bench.bench_pti(model_r, params, peak_tf=peak_tf, peak_bw=peak_bw, batch=b)
        print(json.dumps({"row": "pti", "remat": True, "batch": b, **res}), flush=True)
        n_ok += 1
    except Exception as exc:
        if not bench._is_memory_failure(exc):
            n_failed += 1
        print(f"# pti remat b{b} FAILED: {type(exc).__name__}: {str(exc)[:300]}",
              flush=True)

# rc=1 when real (non-capacity) failures occurred or nothing measured, so
# the queue's rc-based retry actually fires (run_pti_probe's convention)
sys.exit(1 if (n_failed or not n_ok) else 0)
