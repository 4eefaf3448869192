#!/usr/bin/env python
"""Conv-roofline accounting for the encode+decode path (BASELINE.md target:
">=95% of conv roofline per chip").

"Conv roofline" is made measurable as: the sum over every convolution in the
compiled program of that conv's *standalone best-case* execution time on this
chip (same shapes/dtypes/strides, XLA's conv emitter, chained dispatch with a
forcing read). That floor accounts for the fact that small-channel convs
cannot reach the MXU's dense bf16 peak no matter how they are scheduled (see
docs/ARCHITECTURE.md "Conv-kernel exploration"): it is the practical per-chip
envelope for THIS architecture, not a marketing peak.

Method:
1. lower the jitted encode+decode program, parse every `stablehlo.convolution`
   (shapes, strides, feature-group count) from the StableHLO text,
2. microbench each unique conv spec standalone (K chained iterations, final
   device->host read — the tunnel's block_until_ready is async),
3. conv_floor = sum(flops_i / achieved_i); report measured step time vs floor
   (conv_roofline_util = floor / measured, i.e. 1.0 == every conv runs as
   fast in the full program as it ever runs alone AND nothing else costs
   time; non-conv ops make <1.0 expected).

Usage: python tools/conv_roofline.py [--batch 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def _shape(name: str) -> str:
    return rf"tensor<(?P<{name}>[0-9x]+)x(?P<{name}_dt>f32|bf16|f16)>"


_CONV_RE = re.compile(
    r"stablehlo\.convolution\(.*?\)\s*"
    r"dim_numbers\s*=\s*\[b,\s*0,\s*1,\s*f\]x\[0,\s*1,\s*i,\s*o\]->\[b,\s*0,\s*1,\s*f\],\s*"
    r"window\s*=\s*\{(?P<window>[^}]*)\}.*?"
    r"feature_group_count\s*=\s*(?P<fg>\d+).*?"
    r":\s*\(" + _shape("xin") + r",\s*" + _shape("ker") + r"\)\s*->\s*" + _shape("out"),
    re.DOTALL,
)
_STRIDE_RE = re.compile(r"stride\s*=\s*\[(\d+),\s*(\d+)\]")


def parse_convs(stablehlo_text: str) -> list[dict]:
    """Extract every NHWC/HWIO convolution: shapes, stride, groups, dtype."""
    convs = []
    for m in _CONV_RE.finditer(stablehlo_text):
        in_shape = [int(v) for v in m.group("xin").split("x")]
        k_shape = [int(v) for v in m.group("ker").split("x")]
        out_shape = [int(v) for v in m.group("out").split("x")]
        sm = _STRIDE_RE.search(m.group("window"))
        stride = (int(sm.group(1)), int(sm.group(2))) if sm else (1, 1)
        convs.append({
            "in": in_shape, "kernel": k_shape, "out": out_shape,
            "stride": stride, "groups": int(m.group("fg")),
            "dtype": m.group("xin_dt"),
            # 2 * output elements * per-output MACs
            "gflops": 2.0 * np.prod(out_shape) * k_shape[0] * k_shape[1]
                      * k_shape[2] / 1e9,
        })
    return convs


def _force(x) -> None:
    np.asarray(jax.device_get(x.ravel()[0]))


def bench_conv(spec: dict, iters: int = 30, windows: int = 3) -> float:
    """Standalone best-case seconds for one conv spec (min over windows)."""
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}[spec["dtype"]]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(spec["in"]).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.standard_normal(spec["kernel"]).astype(np.float32) * 0.05).astype(dtype)
    pad = "SAME" if spec["out"][1] * spec["stride"][0] >= spec["in"][1] else "VALID"

    def one(x_in):
        return jax.lax.conv_general_dilated(
            x_in, k, window_strides=spec["stride"], padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=spec["groups"],
            preferred_element_type=dtype,
        )

    @jax.jit
    def chain(x_in, n):
        def body(_, carry):
            x_c, acc = carry
            out = one(x_c)
            # fold a scalar of the output back into the input: data-dependent
            # chain at negligible cost, shapes stay static
            scale = (1.0 + 0.0 * out.ravel()[0]).astype(dtype)
            return x_c * scale, acc + out.ravel()[0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, n, body, (x_in, jnp.zeros((), jnp.float32)))
        return acc

    _force(chain(x, 2))  # compile
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        _force(chain(x, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.train.steps import make_inference_fn

    config = {
        "spatial_dims": 2, "in_channels": 1, "out_channels": 1, "latent_channels": 4,
        "channels": [32, 64, 128, 128], "num_res_blocks": 2, "norm_num_groups": 16,
        "norm_eps": 1e-6, "attention_levels": [False, False, False, False],
        "with_encoder_nonlocal_attn": True, "with_decoder_nonlocal_attn": True,
    }
    on_tpu = jax.default_backend() == "tpu"
    model = autoencoder_from_config(
        config, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32
    )
    images = jnp.zeros((args.batch, 256, 256, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))
    infer = make_inference_fn(model)

    txt = infer.lower(params, images).as_text()
    convs = parse_convs(txt)
    if not convs:
        raise SystemExit("no convolutions parsed from the lowered program")

    # unique specs with multiplicity
    uniq: dict[tuple, dict] = {}
    for c in convs:
        key = (tuple(c["in"]), tuple(c["kernel"]), tuple(c["out"]),
               c["stride"], c["groups"], c["dtype"])
        entry = uniq.setdefault(key, {**c, "count": 0})
        entry["count"] += 1

    total_conv_gflops = sum(c["gflops"] * c["count"] for c in uniq.values())
    print(f"# {len(convs)} convs ({len(uniq)} unique shapes), "
          f"{total_conv_gflops:.1f} GFLOP conv work per step", flush=True)

    floor_s = 0.0
    rows = []
    for c in sorted(uniq.values(), key=lambda c: -c["gflops"] * c["count"]):
        t = bench_conv(c, iters=args.iters)
        tfs = c["gflops"] / t / 1e3
        floor_s += t * c["count"]
        rows.append({
            "in": c["in"], "kernel": c["kernel"], "stride": list(c["stride"]),
            "count": c["count"], "gflops": round(c["gflops"], 3),
            "standalone_ms": round(t * 1e3, 3), "standalone_tflops": round(tfs, 1),
        })
        print(f"  {str(c['in']):>22} * {str(c['kernel']):>18} s{c['stride']} "
              f"x{c['count']}: {t*1e3:7.3f} ms @ {tfs:6.1f} TF/s", flush=True)

    # measured end-to-end inference step (same forcing protocol)
    def run_chain(iters):
        out = images
        for _ in range(iters):
            out = infer(params, out)
        return out

    _force(run_chain(2))
    iters = args.iters
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(run_chain(iters))
        best = min(best, (time.perf_counter() - t0) / iters)

    util = floor_s / best
    result = {
        "batch": args.batch,
        "hardware": jax.devices()[0].device_kind,
        "n_convs": len(convs),
        "conv_gflops_per_step": round(total_conv_gflops, 2),
        "conv_floor_ms": round(floor_s * 1e3, 3),
        "measured_step_ms": round(best * 1e3, 3),
        "conv_roofline_util": round(util, 4),
        "convs": rows,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "convs"}, indent=2))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(result, fh, indent=2)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
