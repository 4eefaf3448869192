#!/usr/bin/env python
"""Analytic HBM-traffic model of the flagship train step (CPU-runnable).

VERDICT r3 Weak #3: at b128 the train step measures ~320 ms against a
~177 ms conv-only floor — where do the other ~143 ms go?  The hardware
itemizer (``tools/train_step_itemize.py``) answers empirically; this tool
answers analytically from the LOWERED program alone (no execution, no TPU),
so the decomposition exists even while the tunnel is down and gives the
itemizer's numbers a predicted envelope to land against.

Model (perfect-fusion lower-bound reasoning, stated per category):

* ``conv_boundary`` — for every convolution, its activation (lhs) operand
  must be WRITTEN by the producer fusion and its output READ by the consumer
  fusion. The conv's own read/write of those tensors is priced inside the
  measured conv floor (standalone conv time includes its I/O); the producer
  write and consumer read are *additional* transfers that exist no matter
  how well XLA fuses, because XLA:TPU does not fuse elementwise chains into
  convolution operands.
* ``reduce`` — every ``stablehlo.reduce`` reads its input and writes its
  output. GroupNorm statistics (fwd mean/var, bwd dscale/dbias/dstats) and
  the loss means live here. Two prices are reported:
  - upper: each reduce's lowered input at lowered width (f32 accumulation
    converts make this pessimistic — the convert fuses, the f32 tensor is
    never resident),
  - lower (the headline): each reduce's input traced back through the
    elementwise/broadcast/convert chain to its ROOT materialized values
    (conv outputs, arguments), priced at the root's STORED width (bf16 for
    the conv stack), with reduces sharing an IDENTICAL root set priced as
    ONE pass (XLA multi-output fusion). jnp.var's mean-then-centered-
    moments stays two passes — the variance roots include the mean-reduce
    output — while norm_stats="one_pass" collapses them to one.
* ``optimizer`` — Adam reads p/m/v and writes p/m/v: 6 x param bytes (f32).
  The gradient read is NOT added: weight-grads are conv outputs, and their
  consumer read is already in ``conv_boundary``.
* ``dot_mxu`` — dot_general flops (attention, LPIPS head) at the chip's
  bf16 peak; negligible here but priced for completeness.

predicted_step_ms = conv_floor_ms (measured, from the committed roofline
JSON) + nonconv_bytes / HBM_BW, assuming no overlap between fusions' HBM
traffic (the serial-roofline convention; real overlap would only shrink
the non-conv term).

Known deliberate mismatch vs the real TPU program: the model lowers with
use_pallas_attention resolved on CPU (False), so the bottleneck attention
appears as XLA softmax (its score-matrix reduces are priced); on TPU the
Pallas flash kernel handles those with no HBM score traffic. The model
therefore slightly OVERESTIMATES the TPU step (~2% at b128) — conservative
in the direction that keeps "measured <= predicted" meaningful.

Usage:
    python tools/train_step_hbm_model.py --batch 128 \
        --floor-json docs/conv_roofline_v5e_train_b128.json \
        --json docs/train_hbm_model_b128.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8,
             "i64": 8, "ui64": 8, "i32": 4, "ui32": 4, "i16": 2, "ui16": 2,
             "i8": 1, "ui8": 1, "i1": 1}

_TENSOR_RE = re.compile(r"tensor<(?:([0-9x]+)x)?([a-z]+[0-9]+)>")

_REDUCE_RE = re.compile(
    r"stablehlo\.reduce\((?P<args>[^)]*)\).*?:\s*\((?P<ins>[^)]*)\)\s*->\s*"
    r"(?P<outs>.*)$",
    re.MULTILINE,
)

_DOT_RE = re.compile(
    r"stablehlo\.dot_general\s+[^:]*?"
    r"contracting_dims\s*=\s*\[(?P<lc>[0-9,\s]*)\]\s*x\s*\[[0-9,\s]*\][^:]*"
    r":\s*\(tensor<(?P<a>[0-9x]+)x(?:[a-z0-9]+)>,\s*tensor<[0-9x]+x[a-z0-9]+>\)"
    r"\s*->\s*tensor<(?P<o>[0-9x]+)x(?:[a-z0-9]+)>"
)


def _tensor_bytes(spec: str) -> int:
    """Bytes of one 'tensor<AxBxf32>' spec ('' dims == scalar)."""
    m = _TENSOR_RE.search(spec)
    if not m:
        return 0
    dims, dt = m.groups()
    n = int(np.prod([int(v) for v in dims.split("x")])) if dims else 1
    return n * _DT_BYTES.get(dt, 4)


# Ops a TPU fusion computes on the fly: tracing a reduce input back through
# these finds the tensors that actually cross HBM. transpose/reshape are
# layout-only here; slice/pad/concat/iota/rng are stopped at (roots).
_FUSIBLE_OPS = frozenset((
    "add", "subtract", "multiply", "divide", "negate", "sqrt", "rsqrt",
    "power", "exponential", "log", "abs", "maximum", "minimum", "select",
    "compare", "tanh", "logistic", "clamp", "and", "or", "xor", "not",
    "convert", "broadcast_in_dim", "reshape", "transpose",
    "square",                # chlo.square (jnp.var lowers through it)
    "sharding_constraint",   # sdy annotation: identity
))

_ASSIGN_RE = re.compile(
    r"^\s*%([\w#]+)(?::\d+)?\s*=\s*\"?(?:stablehlo|chlo|sdy)\.([a-z_]+)\"?(.*)$")


def _build_defs(func_text: str) -> dict[str, tuple[str, list[str], str]]:
    """SSA name -> (op, operand names, result tensor spec) for one func."""
    defs: dict[str, tuple[str, list[str], str]] = {}
    for ln in func_text.splitlines():
        m = _ASSIGN_RE.match(ln)
        if not m:
            am = re.match(r"^\s*func\.func.*?\((.*)$", ln)
            if am:  # arguments: '%arg0: tensor<...>, %arg1: tensor<...>'
                for name, spec in re.findall(
                        r"%([\w]+):\s*(tensor<[^>]*>)", ln):
                    defs[name] = ("argument", [], spec)
            continue
        name, op, rest = m.groups()
        before, _, after = rest.rpartition("->")
        out_spec_src = after if after else rest
        specs = re.findall(r"tensor<[^>]*>", out_spec_src)
        body = rest.split(" : ")[0]
        # multi-result uses (%15#0) resolve to their def (%15)
        operands = [o.split("#")[0] for o in re.findall(r"%([\w#]+)", body)]
        defs[name] = (op, operands, specs[-1] if specs else "")
    return defs


def _roots_of(name: str, defs: dict, _depth: int = 0) -> set[str]:
    """Materialized values a fusion reads to compute ``name`` on the fly."""
    if _depth > 200 or name not in defs:
        return {name}
    op, operands, _ = defs[name]
    if op in _FUSIBLE_OPS and operands:
        roots: set[str] = set()
        for o in operands:
            roots |= _roots_of(o, defs, _depth + 1)
        return roots
    if op == "constant":
        return set()  # splats/consts: no HBM read worth pricing
    return {name}


def reduce_traffic(text: str) -> dict:
    """Reduce-pass HBM traffic: rooted lower bound + naive upper bound."""
    upper_in = 0
    lower_in = 0
    attn_in = 0
    out_bytes = 0
    rows: dict[tuple, dict] = {}
    # SSA names repeat across func blocks (custom-vjp private funcs): build
    # defs per block so roots resolve inside the right scope.
    blocks = re.split(r"(?=func\.func)", text)
    for block in blocks:
        if "stablehlo.reduce" not in block:
            continue
        defs = _build_defs(block)
        # Reduces with IDENTICAL root sets and no dependence between them
        # multi-output-fuse: XLA computes them in ONE pass over the roots
        # (this is exactly what norm_stats="one_pass" arranges — mean and
        # E[x^2] share root {conv_out}, while two_pass's variance roots
        # additionally contain the mean-reduce output, forcing a second
        # pass). Group per root-set and price each group's roots once.
        groups: dict[frozenset, dict] = {}
        for m in _REDUCE_RE.finditer(block):
            args = [a.strip() for a in m.group("args").split(",")]
            operands = [a.split(" ")[0].lstrip("%").split("#")[0]
                        for a in args if not a.startswith("init")]
            ins = [s.strip() for s in m.group("ins").split(",")]
            for name, spec in zip(operands, ins):
                b = _tensor_bytes(spec)
                if b <= _DT_BYTES["f64"]:  # scalar init
                    continue
                upper_in += b
                roots = _roots_of(name, defs)
                root_bytes = 0
                for r in roots:
                    rspec = defs.get(r, (None, None, ""))[2]
                    root_bytes += _tensor_bytes(rspec)
                g = groups.setdefault(frozenset(roots), {
                    "root_bytes": root_bytes, "lowered_bytes": 0,
                    # softmax-over-scores reduces: root is a dot_general
                    # output. On TPU these are inside the Pallas flash-
                    # attention kernel (no HBM score traffic) for seq>=512,
                    # so they are priced as their own category.
                    "attn": any(
                        defs.get(r, ("?", [], ""))[0] == "dot_general"
                        for r in roots),
                })
                g["lowered_bytes"] += b
                key = (spec,)
                row = rows.setdefault(key, {"tensor": spec.strip(),
                                            "count": 0, "bytes_each": b})
                row["count"] += 1
            for spec in re.findall(r"tensor<[^>]*>", m.group("outs")):
                out_bytes += _tensor_bytes(spec)
        for g in groups.values():
            cost = (min(g["root_bytes"], g["lowered_bytes"])
                    if g["root_bytes"] else g["lowered_bytes"])
            if g.get("attn"):
                attn_in += cost
            else:
                lower_in += cost
    top = sorted(rows.values(), key=lambda r: -r["bytes_each"] * r["count"])
    return {"lower_in": lower_in, "upper_in": upper_in,
            "attn_in": attn_in, "out": out_bytes, "top": top[:12]}


def dot_flops(text: str) -> float:
    total = 0.0
    for m in _DOT_RE.finditer(text):
        a = [int(v) for v in m.group("a").split("x")]
        out = [int(v) for v in m.group("o").split("x")]
        lc = [int(v) for v in m.group("lc").split(",") if v.strip()]
        k = int(np.prod([a[i] for i in lc])) if lc else 1
        total += 2.0 * np.prod(out) * k
    return total


def conv_boundary_bytes(convs: list[dict]) -> int:
    """Producer-write of every conv's activation operand + consumer-read of
    every conv's output (the conv's OWN I/O is inside the measured floor)."""
    bytes_per = {"f32": 4, "bf16": 2, "f16": 2}
    total = 0
    for c in convs:
        total += int(np.prod(c["in"])) * bytes_per[c["dtype"]]
        total += int(np.prod(c["out"])) * bytes_per[c["out_dtype"]]
    return total


def _lower_train(batch: int, norm_stats: str):
    """Lowered flagship train step (bf16, the TPU program) + param tree."""
    import jax
    import jax.numpy as jnp

    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step
    from __graft_entry__ import FLAGSHIP_CONFIG

    model = autoencoder_from_config(
        FLAGSHIP_CONFIG, compute_dtype=jnp.bfloat16, norm_stats=norm_stats)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(batch, 256, 256, 1)).astype(np.float32))
    mask = jnp.ones((batch,), jnp.float32)
    params_g = jax.eval_shape(
        lambda: model.init(jax.random.key(0), images[:1], jax.random.key(1)))
    params_g = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params_g)
    state = create_train_state(params_g, lr=2.5e-5)
    lpips_params = init_lpips_params()
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
    lowered = step.lower(state, images, mask, {}, lpips_params, jax.random.key(2))
    return lowered.as_text(), params_g, 1


def _lower_diffusion_train(batch: int, norm_stats: str):
    """Lowered flagship LDM train step (bf16 forced — the TPU program).

    Mirrors ``bench.bench_diffusion_train``: conditioned epsilon-MSE on 32²
    latents, Adam over UNet+projector. ``norm_stats`` is accepted for CLI
    symmetry but the UNet uses its own GroupNorm stack built from the
    config (the knob threads through ``diffusion_unet_from_config``)."""
    import optax

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from pti_ldm_vae_tpu.train.diffusion import make_diffusion_train_step

    unet, projector, schedule, lhw, lch, _ = bench_mod._flagship_ldm(
        compute_dtype=jnp.bfloat16)
    latents = jnp.zeros((batch, lhw, lhw, lch), jnp.float32)
    cond = jnp.zeros((batch, lhw, lhw, lch), jnp.float32)
    tokens = cond.reshape(batch, lhw * lhw, lch)
    params = jax.eval_shape(lambda: {
        "unet": unet.init(
            jax.random.key(0), latents, jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch, lhw * lhw, 512), jnp.float32)),
        "projector": projector.init(jax.random.key(1), tokens),
    })
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)
    step = make_diffusion_train_step(unet, schedule, tx, projector=projector,
                                     donate=False)
    lowered = step.lower(params, opt_state, latents, cond, jax.random.key(2))
    return lowered.as_text(), params, 1


def _lower_ddim(batch: int, norm_stats: str):
    """Lowered flagship DDIM sample (bf16 forced — the TPU program).

    The scan body appears ONCE in the lowering (XLA regions), so every
    per-category byte/flop total is scaled by ``num_inference_steps`` — the
    same multiplier ``tools/conv_roofline.py build_ddim`` applies to conv
    counts (out-of-body work is the schedule/projector setup, negligible).
    Root-tracing stops at the while-body block arguments (conservative:
    those reduces price at lowered width).
    """
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from pti_ldm_vae_tpu.train.diffusion import ddim_sample

    unet, projector, schedule, lhw, lch, num_steps = bench_mod._flagship_ldm(
        compute_dtype=jnp.bfloat16)
    if norm_stats != "two_pass":
        # rebuild with the requested stats formulation
        from pti_ldm_vae_tpu.config import load_config
        from pti_ldm_vae_tpu.models.unet import diffusion_unet_from_config

        cfg = load_config(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "config", "ldm_dente.json"))
        unet = diffusion_unet_from_config(
            cfg["diffusion_def"], compute_dtype=jnp.bfloat16,
            norm_stats=norm_stats)
    latent_shape = (batch, lhw, lhw, lch)
    rng = np.random.default_rng(4)
    cond_tokens = jnp.asarray(
        rng.standard_normal((batch, lhw * lhw, lch)).astype(np.float32))
    proj_params = jax.eval_shape(
        lambda: projector.init(jax.random.key(5), cond_tokens))
    proj_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), proj_params)
    context = jax.eval_shape(lambda: projector.apply(proj_params, cond_tokens))
    context = jnp.zeros(context.shape, context.dtype)
    params = jax.eval_shape(lambda: unet.init(
        jax.random.key(0), jnp.zeros(latent_shape),
        jnp.zeros((batch,), jnp.int32), context))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    sample = jax.jit(
        lambda p, ctx, key: ddim_sample(
            unet.apply, p, schedule, latent_shape, key,
            num_inference_steps=num_steps, context=ctx,
        ))
    lowered = sample.lower(params, context, jax.random.key(1))
    return lowered.as_text(), None, num_steps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("train", "ddim", "diffusion"),
                    default="train")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw-gbps", type=float, default=819.0,
                    help="HBM bandwidth (default: v5e 819 GB/s)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 MXU peak (default: v5e 197)")
    ap.add_argument("--norm-stats", choices=("two_pass", "one_pass"),
                    default="two_pass",
                    help="model the step with this GroupNorm stats "
                         "formulation (predicts the run_norm_stats_ab.py "
                         "delta before hardware confirms it)")
    ap.add_argument("--floor-json", default=None,
                    help="committed conv_roofline JSON: supplies the measured "
                         "conv floor + measured step time for comparison")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax

    from tools.conv_roofline import parse_convs

    # Lower EXACTLY what the TPU run lowers (bf16 compute dtype): lowering is
    # platform-independent, so the analysis of the TPU program runs on CPU.
    if args.mode == "train":
        text, params_g, body_mult = _lower_train(args.batch, args.norm_stats)
    elif args.mode == "diffusion":
        text, params_g, body_mult = _lower_diffusion_train(args.batch, args.norm_stats)
    else:
        text, params_g, body_mult = _lower_ddim(args.batch, args.norm_stats)

    convs = parse_convs(text)
    red = reduce_traffic(text)
    red_in = red["lower_in"] * body_mult
    red_attn = red["attn_in"] * body_mult
    red_out = red["out"] * body_mult
    red_upper = red["upper_in"] * body_mult
    red_top = red["top"]
    boundary = conv_boundary_bytes(convs) * body_mult
    if params_g is not None:
        param_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree.leaves(params_g))
        optimizer = 6 * param_bytes  # read p/m/v + write p/m/v (f32)
    else:
        param_bytes = 0
        optimizer = 0  # sampler: no optimizer sweep
    dots = dot_flops(text) * body_mult

    bw = args.bw_gbps * 1e9
    cats_ms = {
        "conv_boundary_ms": boundary / bw * 1e3,
        "reduce_ms": (red_in + red_out) / bw * 1e3,
        # XLA-lowering-only: Pallas flash attention owns these on TPU at
        # seq>=512 (bottleneck + UNet high-res levels) with zero HBM score
        # traffic — kept separate so the TPU prediction can exclude them.
        "attention_softmax_xla_only_ms": red_attn / bw * 1e3,
        "optimizer_ms": optimizer / bw * 1e3,
        "dot_mxu_ms": dots / (args.peak_tflops * 1e12) * 1e3,
    }
    # TPU prediction: attention-softmax reduces excluded (Pallas kernel)
    nonconv_ms = sum(v for k, v in cats_ms.items()
                     if k != "attention_softmax_xla_only_ms")

    result = {
        "mode": args.mode,
        "body_mult": body_mult,
        "note": (
            "predicted_nonconv_ms excludes attention_softmax_xla_only_ms: "
            "on TPU the Pallas flash kernel owns those reduces for "
            "q-seq>=512. Programs with shorter attention sequences (the "
            "LDM UNet's mid/low levels) keep part of that cost, so the "
            "true TPU value lies between predicted_nonconv_ms and "
            "predicted_nonconv_ms + attention_softmax_xla_only_ms."),
        "batch": args.batch,
        "norm_stats": args.norm_stats,
        "model": "perfect-fusion HBM traffic bound (see tool docstring)",
        "bw_gbps": args.bw_gbps,
        "n_convs": len(convs),
        "bytes": {
            "conv_boundary": boundary,
            "reduce_in_rooted": red_in,
            "reduce_in_attention_softmax": red_attn,
            "reduce_in_lowered_upper": red_upper,
            "reduce_out": red_out,
            "optimizer": optimizer,
            "params": param_bytes,
        },
        "dot_gflops": round(dots / 1e9, 2),
        "categories_ms": {k: round(v, 2) for k, v in cats_ms.items()},
        "reduce_ms_upper": round((red_upper + red_out) / bw * 1e3, 2),
        "predicted_nonconv_ms": round(nonconv_ms, 2),
        "reduce_top_tensors": red_top,
    }
    if args.floor_json and os.path.exists(args.floor_json):
        with open(args.floor_json, encoding="utf-8") as fh:
            floor = json.load(fh)
        result["conv_floor_ms"] = floor.get("conv_floor_ms")
        result["measured_step_ms"] = floor.get("measured_step_ms")
        if floor.get("conv_floor_ms") is not None:
            pred = floor["conv_floor_ms"] + nonconv_ms
            result["predicted_step_ms"] = round(pred, 2)
            if floor.get("measured_step_ms"):
                result["predicted_over_measured"] = round(
                    pred / floor["measured_step_ms"], 3)

    print(json.dumps({k: v for k, v in result.items()
                      if k != "reduce_top_tensors"}, indent=2))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(result, fh, indent=1)
        print(f"# wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
