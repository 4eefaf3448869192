#!/usr/bin/env python
"""Microbenchmark: Pallas vs XLA for the fused kernels (fwd and fwd+bwd).

Measures, at the VAE hot-loop shapes:

* GroupNorm+SiLU forward and forward+backward — XLA formulation vs the
  Pallas kernel pair (``ops/pallas/groupnorm_silu.py``),
* flash attention forward+backward at the bottleneck shape — Pallas
  whole-matrix backward vs the XLA-remat backward.

Every timed window ends with a device->host transfer (the tunnel's
``block_until_ready`` is async — see bench.py). Prints one JSON line per
measurement; used to decide the production defaults (measured win or
measured refutation, docs/ARCHITECTURE.md).

    python tools/kernel_microbench.py [--iters 30] [--windows 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")


def _enable_cache_if_tpu() -> None:
    """TPU-only persistent cache, from main() — not at import (the first
    jax.default_backend() call initializes the backend; with the relay down
    even --help would hang before argparse)."""
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 30
WINDOWS = 3


def _force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _time(fn, *args) -> float:
    """Best-of-windows seconds for ITERS chained executions of fn."""
    out = fn(*args)
    _force(out)  # compile
    times = []
    for _ in range(WINDOWS):
        start = time.perf_counter()
        out = args[0]
        for _ in range(ITERS):
            out = fn(out, *args[1:])
        _force(out)
        times.append(time.perf_counter() - start)
    return min(times) / ITERS


def bench_groupnorm(shape, num_groups, dtype=jnp.bfloat16) -> dict:
    from pti_ldm_vae_tpu.ops.norm import group_norm_silu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

    def make(use_pallas):
        @jax.jit
        def fwd(x):
            return group_norm_silu(x, scale, bias, num_groups=num_groups,
                                   use_pallas=use_pallas)

        @jax.jit
        def fwdbwd(x):
            # grad wrt x chains iterations (dx has x's shape) and exercises
            # the backward; scale/bias grads ride along via has_aux-free sum
            return jax.grad(
                lambda xx: jnp.sum(group_norm_silu(
                    xx, scale, bias, num_groups=num_groups, use_pallas=use_pallas
                ).astype(jnp.float32))
            )(x).astype(dtype)

        return fwd, fwdbwd

    fwd_x, bwd_x = make(False)
    fwd_p, bwd_p = make(True)
    out = {
        "kernel": "groupnorm_silu", "shape": list(shape), "groups": num_groups,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "fwd_xla_us": round(_time(fwd_x, x) * 1e6, 1),
        "fwd_pallas_us": round(_time(fwd_p, x) * 1e6, 1),
        "fwdbwd_xla_us": round(_time(bwd_x, x) * 1e6, 1),
        "fwdbwd_pallas_us": round(_time(bwd_p, x) * 1e6, 1),
    }
    out["fwd_speedup"] = round(out["fwd_xla_us"] / max(out["fwd_pallas_us"], 1e-9), 3)
    out["fwdbwd_speedup"] = round(out["fwdbwd_xla_us"] / max(out["fwdbwd_pallas_us"], 1e-9), 3)
    return out


def bench_attention(b, h, s, d, dtype=jnp.bfloat16) -> dict:
    from pti_ldm_vae_tpu.ops.pallas import flash_attention as fa

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32)).astype(dtype)

    def loss(fn):
        return lambda qq: jax.grad(
            lambda x: jnp.sum(fn(x, k, v).astype(jnp.float32))
        )(qq).astype(dtype)

    # Pallas fwd + Pallas whole-matrix bwd (production default on TPU)
    pallas_bwd = jax.jit(loss(fa.flash_attention))
    # Pallas fwd + XLA remat bwd (the round-2 path), via a local clone with
    # the VMEM gate forced shut
    @jax.custom_vjp
    def flash_xla_bwd(q, k, v):
        return fa._forward(q, k, v)

    flash_xla_bwd.defvjp(
        lambda q, k, v: (fa._forward(q, k, v), (q, k, v)),
        lambda res, g: jax.vjp(fa._xla_reference, *res)[1](g),
    )
    xla_bwd = jax.jit(loss(flash_xla_bwd))
    full_xla = jax.jit(loss(fa._xla_reference))

    out = {
        "kernel": "flash_attention", "shape": [b, h, s, d],
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "fwdbwd_pallas_bwd_us": round(_time(pallas_bwd, q) * 1e6, 1),
        "fwdbwd_xla_remat_bwd_us": round(_time(xla_bwd, q) * 1e6, 1),
        "fwdbwd_full_xla_us": round(_time(full_xla, q) * 1e6, 1),
    }
    out["bwd_speedup_vs_remat"] = round(
        out["fwdbwd_xla_remat_bwd_us"] / max(out["fwdbwd_pallas_bwd_us"], 1e-9), 3
    )
    return out


def bench_train_step_variant(batch: int, *, use_pallas_gn: bool, attn_bwd: str) -> dict:
    """Full VAE train step (flagship config) wall-clock under kernel variants.

    attn_bwd: 'pallas' | 'xla' (via the PTI_PALLAS_ATTN_BWD switch, read at
    trace time inside the attention custom-vjp)."""
    os.environ["PTI_PALLAS_ATTN_BWD"] = "1" if attn_bwd == "pallas" else "0"
    from __graft_entry__ import FLAGSHIP_CONFIG

    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    model = autoencoder_from_config(
        FLAGSHIP_CONFIG, compute_dtype=jnp.bfloat16, use_pallas=use_pallas_gn
    )
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0.1, 1.0, size=(batch, 256, 256, 1)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    params_g = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))
    state = create_train_state(params_g, lr=2.5e-5)
    lpips = init_lpips_params()
    holder = {"state": state, "key": jax.random.key(3)}

    def chain(iters):
        for _ in range(iters):
            holder["key"], sub = jax.random.split(holder["key"])
            holder["state"], _m = step(holder["state"], images, mask, {}, lpips, sub)
        return holder["state"].params_g["params"]["quant_conv_mu"]["bias"]

    import time as _t

    _force(chain(3))
    times = []
    for _ in range(WINDOWS):
        t0 = _t.perf_counter()
        _force(chain(ITERS))
        times.append(_t.perf_counter() - t0)
    step_ms = min(times) / ITERS * 1e3
    return {
        "kernel": "vae_train_step", "batch": batch,
        "groupnorm": "pallas" if use_pallas_gn else "xla",
        "attn_bwd": attn_bwd,
        "step_ms": round(step_ms, 3),
        "imgs_per_sec": round(batch / (step_ms / 1e3), 2),
    }


def main(argv=None) -> None:
    global ITERS, WINDOWS
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=ITERS)
    parser.add_argument("--windows", type=int, default=WINDOWS)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--only", choices=("groupnorm", "attention", "trainstep"), default=None)
    args = parser.parse_args(argv)
    _enable_cache_if_tpu()
    ITERS, WINDOWS = args.iters, args.windows
    b = args.batch

    if args.only in (None, "groupnorm"):
        # vae_dente_no_adv level shapes at 256²: (HW, C, G)
        for shape, groups in (
            ((b, 128, 128, 64), 16),
            ((b, 64, 64, 128), 16),
            ((b, 32, 32, 128), 16),
            ((b, 256, 256, 32), 16),  # level 0: above the fwd VMEM cap today
        ):
            try:
                print(json.dumps(bench_groupnorm(shape, groups)), flush=True)
            except Exception as exc:  # noqa: BLE001 — report and continue
                print(json.dumps({"kernel": "groupnorm_silu", "shape": list(shape),
                                  "error": f"{type(exc).__name__}: {exc}"[:300]}),
                      flush=True)

    if args.only in (None, "attention"):
        for b_, h, s, d in ((b, 1, 1024, 128),):
            try:
                print(json.dumps(bench_attention(b_, h, s, d)), flush=True)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"kernel": "flash_attention", "shape": [b_, h, s, d],
                                  "error": f"{type(exc).__name__}: {exc}"[:300]}),
                      flush=True)

    if args.only == "trainstep":
        for gn, attn in ((False, "xla"), (False, "pallas"), (True, "pallas")):
            try:
                print(json.dumps(bench_train_step_variant(
                    b, use_pallas_gn=gn, attn_bwd=attn)), flush=True)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({"kernel": "vae_train_step", "groupnorm": gn,
                                  "attn_bwd": attn,
                                  "error": f"{type(exc).__name__}: {exc}"[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
