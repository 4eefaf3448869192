"""Space-to-depth per-side A/B (1x v5e) — follow-up to run_s2d_ab.py.

The full-model A/B split: inference b8 +69% (553 -> 935 imgs/s) but train
b8 -25% and inference b128 -30% — the 4x-MAC exchange only pays where the
convs are starved, and the decoder tail's c64 upsample conv was already the
weakest microbench win (1.2x). This run isolates the sides:
``s2d_stem="encoder"`` / ``"decoder"`` on train b8 and inference b8/b128,
looking for a config that wins (or at least never loses) everywhere.
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

for mode in ("encoder", "decoder"):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, s2d_stem=mode)

    def make_step():
        return make_train_step(model, None, lcfg, adv_active=False, donate=True)

    try:
        res = bench.bench_train(model, lpips_params, make_step, 8, peak_tf, peak_bw)
        print(json.dumps({"row": "train", "s2d_stem": mode, "batch": 8,
                          "platform": _platform, "hardware": _hardware,
                          **res}), flush=True)
    except Exception as exc:
        print(f"# train s2d={mode} b8 FAILED: {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)

    for b in (8, 128):
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
