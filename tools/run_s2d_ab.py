"""Space-to-depth stem A/B on the flagship VAE (1x v5e).

The round-4 floor analysis prices seven c32 3x3 convs at 256² at ~5% of MXU
peak — the step's dominant irreducible term under the original schedule.
``s2d_stem=True`` runs the encoder level 0 and decoder full-res tail at half
resolution with 4x channels via equivalence-preserving weight transforms
(ops/space_to_depth.py; numerics pinned by tests/test_space_to_depth.py and
tests/test_autoencoder.py::test_s2d_stem_same_params_outputs_and_grads).

A: s2d_stem=False (shipped default) at b8/b128 — sanity row vs BENCH.
B: s2d_stem=True — the candidate. Full train step AND inference rows: the
   transform's win must survive the backward pass (input/filter grads stay
   in the large-channel domain) and the per-step weight-transform overhead.
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
    bench.ITERS, bench.WINDOWS = 2, 1  # CPU smoke sizing
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

for s2d in (False, True):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, s2d_stem=s2d)

    def make_step():
        return make_train_step(model, None, lcfg, adv_active=False, donate=True)

    for b in (8, 128):
        try:
            res = bench.bench_train(model, lpips_params, make_step, b, peak_tf, peak_bw)
            print(json.dumps({"row": "train", "s2d_stem": s2d, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# train s2d={s2d} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)

    for b in (8, 128):
        try:
            params_g = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32),
                jax.random.key(1))
            res = bench.bench_inference(model, params_g, b, peak_tf, peak_bw)
            print(json.dumps({"row": "inference", "s2d_stem": s2d, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# inference s2d={s2d} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
