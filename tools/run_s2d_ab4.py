"""Space-to-depth inference crossover sweep (1x v5e) — full-mode cells.

run_s2d_ab.py measured inference full-s2d at b8 (+69%) and b128 (-30%);
the crossover in between is unmeasured. This run fills inference
full b16/b32/b64, encoder b16/b32, and baselines b16/b32/b64, so the
"auto" inference policy gates on a MEASURED batch threshold per side.
(Train cells land in run_s2d_ab3.py.)
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

peak_tf, peak_bw = 197.0, 819.0

for mode in (True, "encoder", False):
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16, s2d_stem=mode)
    params_g = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32),
        jax.random.key(1))
    batches = {True: (16, 32, 64), "encoder": (16, 32), False: (16, 32, 64)}[mode]
    for b in batches:
        try:
            res = bench.bench_inference(model, params_g, b, peak_tf, peak_bw)
            print(json.dumps({"row": "inference", "s2d_stem": mode, "batch": b,
                              "platform": _platform, "hardware": _hardware,
                              **res}), flush=True)
        except Exception as exc:
            print(f"# inference s2d={mode} b{b} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)
