"""GroupNorm-stats A/B on the flagship VAE train step (1x v5e).

The analytic HBM model (tools/train_step_hbm_model.py) puts the two-pass
GroupNorm statistics reductions at the top of the step's non-conv HBM
traffic. "one_pass" computes mean and E[x^2] from the same operand so XLA's
multi-output fusion reads x from HBM once instead of twice per norm
(numerics pinned CPU-side by tests/test_ops.py).

A: norm_stats="two_pass" (shipped default) at b8/b128 — sanity row vs BENCH.
B: norm_stats="one_pass" at b8/b128 — the candidate new default.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

# Hang-proof first backend touch (the relay flaps right after the queue's
# probe client exits — an unguarded in-process dial can hang for the job's
# whole outer timeout). Non-zero exit lets the queue's retry re-gate.
_platform, _backend_err = bench._resolve_backend()
if _platform is None:
    print(json.dumps({"row": "error", "probe_error": "tpu_backend_unavailable",
                      "detail": _backend_err}))
    sys.exit(3)

import jax
import jax.numpy as jnp

if _platform == "tpu":
    bench.enable_tpu_compile_cache()
else:
    bench.ITERS, bench.WINDOWS = 2, 1  # CPU smoke sizing (bench.setup_platform policy)
_hardware = jax.devices()[0].device_kind
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

for stats in ("two_pass", "one_pass"):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, norm_stats=stats)

    def make_step():
        return make_train_step(model, None, lcfg, adv_active=False, donate=True)

    for b in (8, 128):
        try:
            res = bench.bench_train(model, lpips_params, make_step, b, peak_tf, peak_bw)
            print(json.dumps({"row": "train", "norm_stats": stats, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# train norm_stats={stats} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)

    # inference context rows (b128 already at ~101% of conv floor with
    # two_pass; b8 added in r5 — the shipped-default b8 position was the
    # one unmeasured cell of the flip's A/B matrix, VERDICT r4 weak #3)
    for b in (8, 128):
        try:
            params_g = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32),
                jax.random.key(1))
            res = bench.bench_inference(model, params_g, b, peak_tf, peak_bw)
            print(json.dumps({"row": "inference", "norm_stats": stats, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# inference norm_stats={stats} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
