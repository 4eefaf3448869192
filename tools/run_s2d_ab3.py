"""Space-to-depth encoder-side batch sweep (1x v5e) — the auto-policy data.

run_s2d_ab2.py isolated the win: encoder-only s2d lifts train b8 +18% and
inference b8 +27% while the decoder side causes every regression. This run
locates the batch crossover for the encoder side (train b32/b64/b128,
inference b64) so the "auto" policy can gate on a MEASURED batch threshold
instead of a guess. Baselines (s2d off) ride the warm cache from
run_s2d_ab.py / bench.py.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench

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
    bench.ITERS, bench.WINDOWS = 2, 1
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

for mode in ("encoder", False):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, s2d_stem=mode)

    def make_step():
        return make_train_step(model, None, lcfg, adv_active=False, donate=True)

    for b in (32, 64, 128):
        try:
            res = bench.bench_train(model, lpips_params, make_step, b, peak_tf, peak_bw)
            print(json.dumps({"row": "train", "s2d_stem": mode, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# train s2d={mode} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)

    for b in (64,):
        try:
            params_g = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32),
                jax.random.key(1))
            res = bench.bench_inference(model, params_g, b, peak_tf, peak_bw)
            print(json.dumps({"row": "inference", "s2d_stem": mode, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# inference s2d={mode} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
