#!/usr/bin/env python
"""Itemize the VAE train step's wall-clock into its component programs.

Round-3 open question (VERDICT Weak #3): at b128 the flagship train step
spends ~320 ms against a ~177 ms conv-only floor — where do the other
~143 ms go?  This tool times a ladder of jitted sub-programs that differ by
exactly one component, so consecutive differences price each part:

    vae_fwd        model fwd (sampled recon)            — encoder+decoder fwd
    loss_fwd       full generator loss, value only      — + LPIPS fwd, L1, KL
    loss_fwd_nolp  generator loss value, no LPIPS       — LPIPS fwd = fwd−this
    grad           value_and_grad, NO optimizer         — + backward pass
    grad_nolp      value_and_grad without LPIPS         — LPIPS fwd+bwd priced
    full           grad + Adam apply (the benched step) — optimizer + donation

Same measurement discipline as bench.py (chained windows, forced final
device->host read — the tunnel's block_until_ready is async).

Usage (real numbers need the TPU):
    python tools/train_step_itemize.py --batch 128 --json docs/train_itemize_b128.json
    python tools/train_step_itemize.py --batch 8 --tiny   # CPU smoke (CI)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import bench
from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
from pti_ldm_vae_tpu.models.lpips import init_lpips_params
from pti_ldm_vae_tpu.train.state import create_train_state
from pti_ldm_vae_tpu.train.steps import LossConfig, _generator_losses, make_train_step

TINY_CONFIG = {
    "spatial_dims": 2, "in_channels": 1, "out_channels": 1,
    "latent_channels": 4, "channels": [8, 16], "num_res_blocks": 1,
    "norm_num_groups": 4, "norm_eps": 1e-6,
    "attention_levels": [False, False],
    "with_encoder_nonlocal_attn": True, "with_decoder_nonlocal_attn": True,
}


def _lcfg(use_perceptual: bool) -> LossConfig:
    return LossConfig(
        recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
        adv_weight=0.0, ar_vae_enabled=False, use_perceptual=use_perceptual,
    )


def _time_program(run_chain) -> float:
    """Best-window mean seconds per iteration (bench.py discipline)."""
    bench._force(run_chain(bench.WARMUP))
    times = bench._timed_windows(run_chain)
    return min(times) / bench.ITERS


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=None, help="image side (default bench.HW)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture + 32x32 (CPU smoke / CI)")
    ap.add_argument("--json", default=None, help="write results here too")
    args = ap.parse_args(argv)

    on_tpu = bench.setup_platform()
    hw = args.hw or (32 if args.tiny else bench.HW)
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if args.tiny:
        config = TINY_CONFIG
    else:
        from __graft_entry__ import FLAGSHIP_CONFIG as config

    model = autoencoder_from_config(config, compute_dtype=compute_dtype)
    lpips_params = init_lpips_params()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(args.batch, hw, hw, 1)).astype(np.float32))
    mask = jnp.ones((args.batch,), jnp.float32)
    params_g = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))

    results: dict[str, float] = {}

    # -- forward-only ladder -------------------------------------------------
    @jax.jit
    def vae_fwd(params, x, key):
        recon, z_mu, z_sigma = model.apply(params, x, key)
        return recon

    def chain_fwd(iters):
        out = images
        key = jax.random.key(2)
        for _ in range(iters):
            key, sub = jax.random.split(key)
            out = vae_fwd(params_g, out, sub)  # recon feeds next fwd: chained
        return out[0, 0, 0, 0]

    results["vae_fwd"] = _time_program(chain_fwd)

    def make_loss_value(use_perceptual: bool):
        lcfg = _lcfg(use_perceptual)

        @jax.jit
        def loss_value(params, x, m, key):
            total, _aux = _generator_losses(
                model, None, lcfg, params, None, lpips_params,
                x, m, {}, key, adv_active=False,
            )
            return total

        def chain(iters):
            acc = jnp.zeros(())
            key = jax.random.key(3)
            for _ in range(iters):
                key, sub = jax.random.split(key)
                # accumulate: each iter depends on the previous via acc
                acc = acc + loss_value(params_g, images + 0.0 * acc, mask, sub)
            return acc

        return chain

    results["loss_fwd"] = _time_program(make_loss_value(True))
    results["loss_fwd_nolp"] = _time_program(make_loss_value(False))

    # -- gradient ladder (no optimizer) ---------------------------------------
    def make_grad(use_perceptual: bool):
        lcfg = _lcfg(use_perceptual)

        def loss_fn(params, x, m, key):
            total, _aux = _generator_losses(
                model, None, lcfg, params, None, lpips_params,
                x, m, {}, key, adv_active=False,
            )
            return total

        grad_fn = jax.jit(jax.grad(loss_fn))

        def chain(iters):
            key = jax.random.key(4)
            g = None
            for _ in range(iters):
                key, sub = jax.random.split(key)
                # chain: perturb input by a scalar from the previous grads
                x = images if g is None else images + 0.0 * g["params"]["quant_conv_mu"]["bias"][0]
                g = grad_fn(params_g, x, mask, sub)
            return g["params"]["quant_conv_mu"]["bias"]

        return chain

    results["grad"] = _time_program(make_grad(True))
    results["grad_nolp"] = _time_program(make_grad(False))

    # -- full step (the benched program) ---------------------------------------
    state = create_train_state(params_g, lr=2.5e-5)
    step = make_train_step(model, None, _lcfg(True), adv_active=False, donate=True)
    holder = {"state": state, "key": jax.random.key(5)}

    def chain_full(iters):
        for _ in range(iters):
            holder["key"], sub = jax.random.split(holder["key"])
            holder["state"], _m = step(
                holder["state"], images, mask, {}, lpips_params, sub)
        return holder["state"].params_g["params"]["quant_conv_mu"]["bias"]

    results["full"] = _time_program(chain_full)

    ms = {k: round(v * 1e3, 3) for k, v in results.items()}
    derived = {
        "lpips_fwd_ms": round(ms["loss_fwd"] - ms["loss_fwd_nolp"], 3),
        "lpips_fwd_bwd_ms": round(ms["grad"] - ms["grad_nolp"], 3),
        "backward_ms": round(ms["grad"] - ms["loss_fwd"], 3),
        "backward_nolp_ms": round(ms["grad_nolp"] - ms["loss_fwd_nolp"], 3),
        "optimizer_ms": round(ms["full"] - ms["grad"], 3),
        "loss_overhead_fwd_ms": round(ms["loss_fwd_nolp"] - ms["vae_fwd"], 3),
    }
    payload = {
        "batch": args.batch,
        "hw": hw,
        "hardware": jax.devices()[0].device_kind,
        "platform": jax.default_backend(),
        "tiny": bool(args.tiny),
        "programs_ms": ms,
        "derived_ms": derived,
        "note": (
            "programs differ by exactly one component; consecutive "
            "differences price LPIPS fwd / LPIPS fwd+bwd / backward / "
            "optimizer. Differences between separately-jitted programs "
            "carry fusion noise — treat <1ms deltas as zero."
        ),
    }
    print(json.dumps(payload))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
