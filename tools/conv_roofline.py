#!/usr/bin/env python
"""Conv-roofline accounting for the VAE workload (BASELINE.md target:
">=95% of conv roofline per chip").

"Conv roofline" is made measurable as: the sum over every convolution in the
compiled program of that conv's *standalone best-case* execution time on this
chip (same shapes/layouts/strides/dilations, XLA's conv emitter, chained
dispatch with a forcing read). That floor accounts for the fact that
small-channel convs cannot reach the MXU's dense bf16 peak no matter how they
are scheduled (docs/ARCHITECTURE.md "Conv-kernel exploration"): it is the
practical per-chip envelope for THIS architecture, not a marketing peak.

Method:
1. lower the jitted program (encode+decode, or the full train step with
   ``--mode train``), parse every ``stablehlo.convolution`` — shapes, strides,
   padding, lhs/rhs dilation, group counts, and arbitrary dim_numbers (the
   backward pass emits input-grad convs with reversed/dilated kernels and
   filter-grad convs with batch<->feature swapped layouts),
2. microbench each unique conv spec standalone. Two measurement details are
   load-bearing on this tunnel (async dispatch, ~25 ms round-trip):
   iteration counts adapt until the window dwarfs the RTT, and the loop body
   consumes the WHOLE output via a fused sum + feeds a compile-opaque scalar
   back into the input (consuming one element lets XLA narrow the conv to
   that element; a 0.0-scaled feedback constant-folds and the conv hoists
   out of the loop — both observed),
3. conv_floor = sum(t_i * count_i); conv_roofline_util = floor / measured
   step time (1.0 == every conv runs as fast in the full program as it ever
   runs alone AND everything else is free; non-conv ops push it below 1).

Usage: python tools/conv_roofline.py [--mode inference|train] [--batch 8]
       [--json out.json]
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


def _enable_cache_if_tpu() -> None:
    """TPU-only persistent cache (foreign-host XLA:CPU AOT entries SIGILL),
    called from main()/the probe child — NOT at import: jax.default_backend()
    initializes the backend, and with the tunnel relay down that would make
    even --help hang/stack-dump before argparse runs."""
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_CONV_RE = re.compile(
    r"stablehlo\.convolution\(.*?\)\s*"
    r"dim_numbers\s*=\s*\[(?P<lhs>[^\]]*)\]x\[(?P<rhs>[^\]]*)\]->\[(?P<out>[^\]]*)\],\s*"
    r"window\s*=\s*\{(?P<window>[^}]*)\}(?P<rest>.*?)"
    r":\s*\(tensor<(?P<xin>[0-9x]+)x(?P<xin_dt>f32|bf16|f16)>,\s*"
    r"tensor<(?P<ker>[0-9x]+)x(?P<ker_dt>f32|bf16|f16)>\)\s*->\s*"
    r"tensor<(?P<out_sh>[0-9x]+)x(?P<out_dt>f32|bf16|f16)>",
    re.DOTALL,
)


def _pad_pairs(window: str, n: int) -> list:
    m = re.search(r"pad\s*=\s*\[(.*?)\]\]", window)
    if not m:
        return [[0, 0]] * n
    return json.loads("[" + m.group(1) + "]]")


def _vec(window: str, name: str, n: int, default: int) -> tuple:
    m = re.search(rf"{name}\s*=\s*\[([0-9,\s]*)\]", window)
    if not m:
        return (default,) * n
    return tuple(int(v) for v in m.group(1).split(","))


def _positions(spec: str, batch_ch: str, feat_ch: str) -> tuple:
    """'b, 0, 1, f' -> (batch_pos, feat_pos, spatial_pos_in_order)."""
    parts = [s.strip() for s in spec.split(",")]
    spatial = sorted(
        (int(p), i) for i, p in enumerate(parts) if p not in (batch_ch, feat_ch)
    )
    return (
        parts.index(batch_ch),
        parts.index(feat_ch),
        tuple(i for _, i in spatial),
    )


def parse_convs(stablehlo_text: str) -> list[dict]:
    """Every convolution: shapes, window config, dim numbers, groups, dtype."""
    convs = []
    for m in _CONV_RE.finditer(stablehlo_text):
        in_shape = [int(v) for v in m.group("xin").split("x")]
        k_shape = [int(v) for v in m.group("ker").split("x")]
        out_shape = [int(v) for v in m.group("out_sh").split("x")]
        nsp = len(in_shape) - 2
        window = m.group("window")
        rest = m.group("rest")
        fg = re.search(r"feature_group_count\s*=\s*(\d+)", rest)
        bg = re.search(r"batch_group_count\s*=\s*(\d+)", rest)

        lhs = _positions(m.group("lhs"), "b", "f")
        rhs = _positions(m.group("rhs"), "i", "o")  # (i_pos, o_pos, spatial)
        out = _positions(m.group("out"), "b", "f")
        kernel_i = k_shape[rhs[0]]
        kernel_spatial = [k_shape[i] for i in rhs[2]]
        convs.append({
            "in": in_shape, "kernel": k_shape, "out": out_shape,
            "stride": _vec(window, "stride", nsp, 1),
            "pad": _pad_pairs(window, nsp),
            "lhs_dilate": _vec(window, "lhs_dilate", nsp, 1),
            "rhs_dilate": _vec(window, "rhs_dilate", nsp, 1),
            "dims": (
                (lhs[0], lhs[1], *lhs[2]),   # lhs: (batch, feature, *spatial)
                (rhs[1], rhs[0], *rhs[2]),   # rhs: (out_feat, in_feat, *spatial)
                (out[0], out[1], *out[2]),
            ),
            "groups": int(fg.group(1)) if fg else 1,
            "batch_groups": int(bg.group(1)) if bg else 1,
            "dtype": m.group("xin_dt"),
            "out_dtype": m.group("out_dt"),
            "gflops": 2.0 * np.prod(out_shape) * np.prod(kernel_spatial)
                      * kernel_i / 1e9,
        })
    return convs


def _force(x) -> None:
    np.asarray(jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16}


class SkipConv(Exception):
    """Raised for specs the microbench cannot run (priced by extrapolation)."""


_OPERAND_GB_CAP = 0.35  # b8-scale operands: known to compile fast on the tunnel


def _operand_gb(spec: dict) -> float:
    bytes_per = {"f32": 4, "bf16": 2, "f16": 2}
    return (
        np.prod(spec["in"]) * bytes_per[spec["dtype"]]
        + np.prod(spec["kernel"]) * bytes_per[spec["dtype"]]
    ) / 1e9


def _bench_conv_scaled(spec: dict, iters: int, windows: int) -> float:
    """Sub-size measurement with measured scaling, for specs that cannot be
    benched at full size (operands over the memory cap, or remote compiles
    that exceed the probe timeout — observed: standalone b64/b128 conv
    chains churn the remote compiler for 15+ min).

    Axis choice:
    * filter-grad signature (kernel operand is activation-sized: the train
      batch sits on the CONTRACTION axis, lhs feature == rhs input-feature)
      -> shrink the contraction; output shape unchanged, work linear.
    * otherwise -> shrink the LHS BATCH axis (independent rows; per-sample
      work constant), shrinking the output batch dim with it.

    Two sub-sizes are measured (each with its own compile probe), scaling is
    linearity-checked, and a secant extrapolates to the full size (absorbing
    fixed per-call overhead). Nonlinear pairs fall back to proportional
    scaling from the larger point and say so.
    """
    lhs_batch, lhs_feat = spec["dims"][0][0], spec["dims"][0][1]
    rhs_in = spec["dims"][1][1]
    out_batch = spec["dims"][2][0]

    # filter-grad signature: the "kernel" operand is an activation-sized
    # gradient (large spatial dims), not a real weight — channels alone
    # cannot discriminate (lhs feature == rhs input-feature for EVERY conv).
    kernel_spatial = [spec["kernel"][i] for i in spec["dims"][1][2:]]
    filter_grad = (
        spec["groups"] == 1 and spec["batch_groups"] == 1
        and max(kernel_spatial) > 7
        and spec["in"][lhs_feat] >= 16
    )
    if filter_grad:
        axis_desc = "contraction"
        n = spec["in"][lhs_feat]

        def shrunk(k: int) -> dict:
            s = {**spec, "in": list(spec["in"]), "kernel": list(spec["kernel"])}
            s["in"][lhs_feat] = k
            s["kernel"][rhs_in] = k
            return s
    elif spec["in"][lhs_batch] >= 16 and spec["batch_groups"] == 1:
        axis_desc = "batch"
        n = spec["in"][lhs_batch]

        def shrunk(k: int) -> dict:
            s = {**spec, "in": list(spec["in"]), "out": list(spec["out"])}
            s["in"][lhs_batch] = k
            s["out"][out_batch] = k
            return s
    else:
        raise SkipConv("no shrinkable axis for scaled measurement")

    # largest power-of-two sub-size under the cap, at most n//2, floored at
    # the b8-scale sizes known to compile quickly
    k2 = n // 2
    while k2 > 8 and _operand_gb(shrunk(k2)) > _OPERAND_GB_CAP:
        k2 //= 2
    k2 = min(k2, 16)
    k1 = max(k2 // 2, 1)
    if k2 < 2 or k1 == k2:
        raise SkipConv("cannot find a compilable sub-size")
    t1 = bench_conv(shrunk(k1), iters, windows)
    t2 = bench_conv(shrunk(k2), iters, windows)
    ratio = t2 / max(t1, 1e-12)
    expected = k2 / k1
    linear = 0.7 * expected <= ratio <= 1.3 * expected
    secant = t2 + (t2 - t1) / (k2 - k1) * (n - k2)
    proportional = t2 * n / k2
    # The floor must not OVERSTATE a conv's standalone time (a too-high
    # floor inflates the utilization claim): take the smaller extrapolation.
    # Sub-linear pairs (latency-bound at the sub-sizes) keep the secant.
    t_full = max(min(secant, proportional), t2)
    print(f"    scaled {spec['in']}x{spec['kernel']}: {axis_desc} {n} -> "
          f"[{k1},{k2}] measured ({t1*1e3:.3f},{t2*1e3:.3f}) ms, ratio {ratio:.2f} "
          f"(linear={linear}, secant {secant*1e3:.3f} / prop {proportional*1e3:.3f}) "
          f"-> {t_full*1e3:.3f} ms",
          flush=True)
    return t_full


def _chain_for_spec(spec: dict):
    """Jitted chained-dispatch benchmark program for one conv spec."""
    dtype = _DTYPES[spec["dtype"]]
    out_dtype = _DTYPES[spec["out_dtype"]]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(spec["in"]).astype(np.float32)).astype(dtype)
    k = jnp.asarray(
        (rng.standard_normal(spec["kernel"]) * 0.05).astype(np.float32)
    ).astype(dtype)
    dims = jax.lax.ConvDimensionNumbers(*[tuple(d) for d in spec["dims"]])

    def one(x_in):
        return jax.lax.conv_general_dilated(
            x_in, k,
            window_strides=spec["stride"],
            padding=[tuple(p) for p in spec["pad"]],
            lhs_dilation=spec["lhs_dilate"],
            rhs_dilation=spec["rhs_dilate"],
            dimension_numbers=dims,
            feature_group_count=spec["groups"],
            batch_group_count=spec["batch_groups"],
            preferred_element_type=out_dtype,
        )

    @jax.jit
    def chain(x_in, n):
        def body(_, carry):
            x_c, acc = carry
            s = jnp.sum(one(x_c).astype(jnp.float32))
            feedback = (s * 1e-20).astype(dtype)
            return x_c + feedback, acc + s
        _, acc = jax.lax.fori_loop(0, n, body, (x_in, jnp.zeros((), jnp.float32)))
        return acc

    return chain, x


_PROBE_TIMEOUT_S = 360


def _probe_compile(spec: dict) -> None:
    """Compile the spec's bench chain in a SUBPROCESS with a hard timeout.

    Some gradient-conv shapes wedge the remote compiler indefinitely (b64
    run: zero progress in 50 min on the first shape); an in-process compile
    cannot be cancelled. The child populates the persistent compilation
    cache, so on success the parent's own compile is a cache hit. Raises
    SkipConv on timeout/failure (the shape joins the extrapolated tail)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe-spec", json.dumps(spec)],
            timeout=_PROBE_TIMEOUT_S, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired as exc:
        raise SkipConv(f"compile probe timed out after {_PROBE_TIMEOUT_S}s") from exc
    if proc.returncode != 0:
        raise SkipConv(f"compile probe failed: {proc.stderr.strip()[-200:]}")


def bench_conv(spec: dict, iters: int = 30, windows: int = 3,
               probe: bool = True) -> float:
    """Standalone best-case seconds for one conv spec (min over windows)."""
    dtype = _DTYPES[spec["dtype"]]
    operand_gb = _operand_gb(spec)
    if operand_gb > _OPERAND_GB_CAP:
        # Giant gradient convs (full-batch filter grads at b64/128) wedge the
        # remote compiler; measure sub-sizes and extrapolate with a
        # measured-linearity check instead.
        return _bench_conv_scaled(spec, iters, windows)
    if probe:
        try:
            _probe_compile(spec)
        except SkipConv as exc:
            # full-size compile too slow for the tunnel: measure sub-sizes
            print(f"    probe: {exc}; falling back to scaled measurement",
                  flush=True)
            return _bench_conv_scaled(spec, iters, windows)
    chain, x = _chain_for_spec(spec)

    _force(chain(x, 2))  # compile (cache hit when the probe ran)
    # The tunnel round-trip is ~25 ms with several ms of variance; for fast
    # kernels it swamps the window unless the chain is long enough. Estimate
    # the per-iteration cost NET of overhead first (scaling the raw window
    # would target the RTT, not the compute), then size the chain for
    # >=0.5 s of pure compute so RTT variance is <2% error.
    overhead = min(
        _timed(lambda: _force(chain(x, 0))) for _ in range(3)
    )
    probe = max(_timed(lambda: _force(chain(x, iters))) - overhead, 0.0)
    per_iter_est = max(probe / iters, 2e-7)
    iters = min(max(iters, int(0.5 / per_iter_est)), 100_000)

    best = float("inf")
    for _ in range(windows):
        elapsed = _timed(lambda: _force(chain(x, iters))) - overhead
        best = min(best, max(elapsed, 1e-9) / iters)
    return best


def _measure_program(run_chain, iters: int) -> float:
    _force(run_chain(2))
    overhead = min(_timed(lambda: _force(run_chain(0))) for _ in range(3))
    best = float("inf")
    for _ in range(3):
        elapsed = _timed(lambda: _force(run_chain(iters))) - overhead
        best = min(best, max(elapsed, 1e-9) / iters)
    return best


# the benched architecture is the driver's flagship (one definition)
from __graft_entry__ import FLAGSHIP_CONFIG as CONFIG  # noqa: E402


def build_inference(batch: int, s2d_stem=False):
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.train.steps import make_inference_fn

    on_tpu = jax.default_backend() == "tpu"
    model = autoencoder_from_config(
        CONFIG, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        s2d_stem=s2d_stem,
    )
    images = jnp.zeros((batch, 256, 256, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))
    infer = make_inference_fn(model)
    lowered = infer.lower(params, images)

    def run_chain(iters):
        out = images
        for _ in range(iters):
            out = infer(params, out)
        return out

    return lowered, run_chain


def build_ddim(batch: int):
    """Flagship DDIM sampler: one full sample = ``num_inference_steps``
    scanned UNet calls. The lowered program contains the scan body ONCE
    (XLA regions, same reason cost_analysis counts it once), so this
    builder returns ``num_steps`` as the body multiplier and ``main``
    scales every conv's count by it — the floor then prices a full sample,
    which is what ``run_chain`` measures. Every convolution in this
    program lives inside the scan body (the conditioning projector is a
    matmul), so the uniform multiplier is exact."""
    import bench as bench_mod  # repo-root bench.py: the one flagship-LDM definition
    from pti_ldm_vae_tpu.train.diffusion import ddim_sample

    unet, projector, schedule, lhw, lch, num_steps = bench_mod._flagship_ldm()
    latent_shape = (batch, lhw, lhw, lch)
    rng = np.random.default_rng(4)
    cond_tokens = jnp.asarray(
        rng.standard_normal((batch, lhw * lhw, lch)).astype(np.float32)
    )
    proj_params = projector.init(jax.random.key(5), cond_tokens)
    context = projector.apply(proj_params, cond_tokens)
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros(latent_shape), jnp.zeros((batch,), jnp.int32), context
    )
    # Context as a runtime argument (a closure capture would serialize it
    # into the HLO as a literal — 268 MB at b128, past the tunnel's
    # remote-compile payload cap; see bench.bench_ddim).
    sample = jax.jit(
        lambda p, ctx, key: ddim_sample(
            unet.apply, p, schedule, latent_shape, key,
            num_inference_steps=num_steps, context=ctx,
        )
    )
    lowered = sample.lower(params, context, jax.random.key(1))

    def run_chain(iters):
        out = None
        key = jax.random.key(2)
        for _ in range(iters):
            key, sub = jax.random.split(key)
            if out is not None:  # data-chain via the previous sample
                sub = jax.random.fold_in(sub, (out.ravel()[0] * 0).astype(jnp.int32))
            out = sample(params, context, sub)
        return out if out is not None else jnp.zeros(())

    return lowered, run_chain, num_steps


def build_diffusion_train(batch: int):
    """Flagship LDM epsilon-MSE train step (conditioned) on 32² latents —
    the program ``bench.bench_diffusion_train`` measures. Most of the
    UNet's work is attention dot_generals, not convs: the conv floor here
    bounds only the conv fraction (the analytic HBM model prices the
    rest; tools/train_step_hbm_model.py --mode diffusion)."""
    import optax

    import bench as bench_mod
    from pti_ldm_vae_tpu.train.diffusion import make_diffusion_train_step

    unet, projector, schedule, lhw, lch, _ = bench_mod._flagship_ldm()
    rng = np.random.default_rng(6)
    latents = jnp.asarray(rng.standard_normal((batch, lhw, lhw, lch)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((batch, lhw, lhw, lch)).astype(np.float32))
    tokens = cond.reshape(batch, lhw * lhw, lch)
    params = {
        "unet": jax.jit(unet.init)(
            jax.random.key(0), latents, jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch, lhw * lhw, 512), jnp.float32),
        ),
        "projector": projector.init(jax.random.key(1), tokens),
    }
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)
    step = make_diffusion_train_step(unet, schedule, tx, projector=projector,
                                     donate=False)
    lowered = step.lower(params, opt_state, latents, cond, jax.random.key(2))

    holder = {"params": params, "opt": opt_state, "key": jax.random.key(3)}

    def run_chain(iters):
        for _ in range(iters):
            holder["key"], sub = jax.random.split(holder["key"])
            holder["params"], holder["opt"], _loss = step(
                holder["params"], holder["opt"], latents, cond, sub
            )
        return holder["params"]["projector"]

    return lowered, run_chain


def build_train(batch: int, s2d_stem=False):
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    model = autoencoder_from_config(
        CONFIG, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        s2d_stem=s2d_stem,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(batch, 256, 256, 1)).astype(np.float32)
    )
    mask = jnp.ones((batch,), jnp.float32)
    params_g = jax.jit(model.init)(jax.random.key(0), images[:1], jax.random.key(1))
    state = create_train_state(params_g, lr=2.5e-5)
    lpips_params = init_lpips_params()
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
    lowered = step.lower(state, images, mask, {}, lpips_params, jax.random.key(2))

    holder = {"state": state, "key": jax.random.key(3)}

    def run_chain(iters):
        for _ in range(iters):
            holder["key"], sub = jax.random.split(holder["key"])
            holder["state"], _ = step(
                holder["state"], images, mask, {}, lpips_params, sub
            )
        return holder["state"].params_g["params"]["quant_conv_mu"]["bias"]

    return lowered, run_chain


def _roofline_util(floor_s: float, measured_s: float, n_benched: int):
    """Floor/measured utilization, or None when ZERO shapes were benched
    (budget exhausted before the first shape, or every probe failed):
    with no floor at all the util must be null, not a fabricated 0.0 that
    downstream tooling (bench.py's recorded-roofline block) would publish
    as a measured position."""
    if n_benched == 0:
        return None
    return floor_s / measured_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-spec", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--mode", choices=("inference", "train", "ddim", "diffusion"),
                    default="inference")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=None,
                    help="Bench only the N highest-work unique shapes; the "
                    "tail is priced at the TF/s of the nearest benched conv "
                    "of the same dim-numbers family (reported as "
                    "extrapolated_gflops). Bounds wall-clock when a program "
                    "has ~100 unique conv shapes.")
    ap.add_argument("--budget-s", type=float, default=None,
                    help="Wall-clock budget for the per-shape microbench "
                    "phase. Once exceeded, remaining shapes defer to the "
                    "extrapolated tail (recorded in extrapolated_gflops) "
                    "and the run still finishes with an honest JSON — "
                    "unlike an external timeout kill, which writes nothing.")
    ap.add_argument("--probe-timeout", type=float, default=None,
                    help="Override the per-shape compile-probe subprocess "
                    "timeout (seconds, default 360). Lower it for wide "
                    "full-coverage runs where many mid-size gradient convs "
                    "each burn the full timeout before falling back to the "
                    "scaled measurement.")
    ap.add_argument("--json", default=None)
    ap.add_argument("--s2d", default="false",
                    choices=("false", "true", "encoder", "decoder"),
                    help="price the s2d_stem conv program instead of the "
                         "standard one (inference/train modes only)")
    args = ap.parse_args()
    s2d_stem = {"false": False, "true": True}.get(args.s2d, args.s2d)
    if args.probe_timeout is not None:
        global _PROBE_TIMEOUT_S
        _PROBE_TIMEOUT_S = args.probe_timeout

    _enable_cache_if_tpu()

    if args.probe_spec:
        # child process of _probe_compile: compile (and once execute) the
        # spec's chain, populating the shared persistent cache, then exit.
        chain, x = _chain_for_spec(json.loads(args.probe_spec))
        _force(chain(x, 2))
        return

    body_mult = 1
    if args.mode == "inference":
        lowered, run_chain = build_inference(args.batch, s2d_stem=s2d_stem)
    elif args.mode == "train":
        lowered, run_chain = build_train(args.batch, s2d_stem=s2d_stem)
    elif args.mode == "diffusion":
        lowered, run_chain = build_diffusion_train(args.batch)
    else:
        lowered, run_chain, body_mult = build_ddim(args.batch)
    convs = parse_convs(lowered.as_text())
    if not convs:
        raise SystemExit("no convolutions parsed from the lowered program")

    uniq: dict[tuple, dict] = {}
    for c in convs:
        key = (tuple(c["in"]), tuple(c["kernel"]), tuple(c["out"]),
               c["stride"], tuple(map(tuple, c["pad"])), c["lhs_dilate"],
               c["rhs_dilate"], tuple(map(tuple, c["dims"])), c["groups"],
               c["batch_groups"], c["dtype"], c["out_dtype"])
        entry = uniq.setdefault(key, {**c, "count": 0})
        entry["count"] += body_mult  # scan-body convs execute body_mult x/step

    total_conv_gflops = sum(c["gflops"] * c["count"] for c in uniq.values())
    print(f"# mode={args.mode} b{args.batch}: {len(convs) * body_mult} convs "
          f"({len(uniq)} unique), {total_conv_gflops:.1f} GFLOP conv work/step",
          flush=True)

    ordered = sorted(uniq.values(), key=lambda c: -c["gflops"] * c["count"])
    to_bench = ordered if args.top is None else ordered[:args.top]
    tail = [] if args.top is None else ordered[args.top:]

    def fam(c):
        return tuple(map(tuple, c["dims"]))

    floor_s = 0.0
    unbenched_gflops = 0.0
    extrapolated_gflops = 0.0
    benched: list[dict] = []
    rows = []
    bench_start = time.perf_counter()
    for i, c in enumerate(to_bench):
        if args.budget_s is not None and time.perf_counter() - bench_start > args.budget_s:
            print(f"  BUDGET exhausted after {i}/{len(to_bench)} shapes; "
                  f"deferring the rest to the extrapolated tail", flush=True)
            tail.extend(to_bench[i:])
            break
        try:
            t = bench_conv(c, iters=args.iters)
        except Exception as exc:
            # failed/oversized specs join the extrapolated tail
            tail.append(c)
            print(f"  DEFERRED {c['in']}x{c['kernel']}: "
                  f"{type(exc).__name__}: {str(exc)[:80]}", flush=True)
            continue
        tfs = c["gflops"] / t / 1e3
        floor_s += t * c["count"]
        benched.append({**c, "tfs": tfs})
        rows.append({
            "in": c["in"], "kernel": c["kernel"], "out": c["out"],
            "stride": list(c["stride"]), "count": c["count"],
            "gflops": round(c["gflops"], 3),
            "standalone_ms": round(t * 1e3, 4), "standalone_tflops": round(tfs, 1),
        })
        print(f"  {str(c['in']):>22} * {str(c['kernel']):>18} s{c['stride']} "
              f"x{c['count']}: {t*1e3:8.4f} ms @ {tfs:6.1f} TF/s", flush=True)

    for c in tail:
        work = c["gflops"] * c["count"]
        if not benched:
            unbenched_gflops += work
            continue
        same_fam = [b for b in benched if fam(b) == fam(c)] or benched
        nearest = min(same_fam, key=lambda b: abs(b["gflops"] - c["gflops"]))
        floor_s += work / nearest["tfs"] / 1e3
        extrapolated_gflops += work

    measured = _measure_program(run_chain, args.iters)
    util = _roofline_util(floor_s, measured, n_benched=len(benched))
    result = {
        "mode": args.mode,
        "batch": args.batch,
        "s2d_stem": s2d_stem,
        "hardware": jax.devices()[0].device_kind,
        "n_convs": len(convs) * body_mult,
        "conv_gflops_per_step": round(total_conv_gflops, 2),
        "unbenched_gflops": round(unbenched_gflops, 2),
        "extrapolated_gflops": round(extrapolated_gflops, 2),
        "conv_floor_ms": round(floor_s * 1e3, 3),
        "measured_step_ms": round(measured * 1e3, 3),
        "conv_roofline_util": round(util, 4) if util is not None else None,
        "convs": rows,
    }
    if util is None:
        result["note"] = "no shapes benched (budget/probe failures); no floor"
    print(json.dumps({k: v for k, v in result.items() if k != "convs"}, indent=2))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(result, fh, indent=2)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
