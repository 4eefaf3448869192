#!/usr/bin/env python
"""Space-to-depth conv A/B — prices the exchange behind ``ops/space_to_depth``.

The round-4 floor analysis (docs/ARCHITECTURE.md "Conv-kernel exploration")
attributes the full-resolution levels' cost to small-channel 256² convs
running at ~5% of the v5e MXU peak. The s2d reformulation runs the SAME math
at 128² with 4x channels and 4x the issued MACs (ops/space_to_depth.py
module docstring derives the weight transforms; tests/test_space_to_depth.py
pins bit-equivalence). Whether the 4x-MAC/10-20x-utilisation exchange wins
is a hardware question — this tool answers it per conv.

For every conv the flagship's full-res levels execute (encoder level 0 +
decoder tail, ``config/vae_dente_no_adv.json`` channels [32,64,128,128]),
measure the original spec and its s2d form standalone with the
conv_roofline measurement discipline (chained dispatch, whole-output
consumption, forcing read), then aggregate with per-program counts.

Usage: python tools/s2d_microbench.py [--batch 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from conv_roofline import _enable_cache_if_tpu, bench_conv  # noqa: E402

# NHWC / HWIO / NHWC
_DIMS = [[0, 3, 1, 2], [3, 2, 0, 1], [0, 3, 1, 2]]


def _spec(b, h, w, c, kh, kw, o, *, stride=1, pad=1, dtype="bf16"):
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(pad, int):
        pads = [[pad, pad], [pad, pad]]
    else:
        pads = [list(pad), list(pad)]
    oh = (h + pads[0][0] + pads[0][1] - kh) // sh + 1
    ow = (w + pads[1][0] + pads[1][1] - kw) // sw + 1
    return {
        "in": [b, h, w, c], "kernel": [kh, kw, c, o], "out": [b, oh, ow, o],
        "dims": _DIMS, "stride": [sh, sw], "pad": pads,
        "lhs_dilate": [1, 1], "rhs_dilate": [1, 1],
        "groups": 1, "batch_groups": 1, "dtype": dtype, "out_dtype": dtype,
    }


def _pairs(b: int) -> list[dict]:
    """(name, count_in_fwd_program, original spec, s2d spec) rows.

    Counts for the flagship fwd encode+decode: 7 c32 3x3 convs at 256²
    (4 encoder + 3 decoder), 1 conv_in, 1 downsample, 1 upsample conv (c64),
    1 decoder res conv1 (64->32), 1 nin shortcut, 1 conv_out.
    """
    return [
        dict(name="conv_in_1_to_32", count=1,
             orig=_spec(b, 256, 256, 1, 3, 3, 32),
             s2d=_spec(b, 128, 128, 4, 3, 3, 128)),
        dict(name="res_3x3_c32", count=7,
             orig=_spec(b, 256, 256, 32, 3, 3, 32),
             s2d=_spec(b, 128, 128, 128, 3, 3, 128)),
        dict(name="downsample_c32", count=1,
             orig=_spec(b, 256, 256, 32, 3, 3, 32, stride=2, pad=(0, 1)),
             s2d=_spec(b, 128, 128, 128, 2, 2, 32, stride=1, pad=(0, 1))),
        dict(name="upsample_conv_c64", count=1,
             orig=_spec(b, 256, 256, 64, 3, 3, 64),
             s2d=_spec(b, 128, 128, 256, 3, 3, 256)),
        dict(name="dec_res_conv1_64_to_32", count=1,
             orig=_spec(b, 256, 256, 64, 3, 3, 32),
             s2d=_spec(b, 128, 128, 256, 3, 3, 128)),
        dict(name="nin_shortcut_1x1_64_to_32", count=1,
             orig=_spec(b, 256, 256, 64, 1, 1, 32, pad=0),
             s2d=_spec(b, 128, 128, 256, 1, 1, 128, pad=0)),
        dict(name="conv_out_32_to_1", count=1,
             orig=_spec(b, 256, 256, 32, 3, 3, 1),
             s2d=_spec(b, 128, 128, 128, 3, 3, 4)),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    _enable_cache_if_tpu()

    kind = jax.devices()[0].device_kind
    rows = []
    tot_orig = tot_s2d = 0.0
    for pair in _pairs(args.batch):
        t0 = time.perf_counter()
        # probe=False: these specs are all comfortably under the operand cap
        # and known to compile quickly; the probe SUBPROCESS is the fragile
        # part here (each child re-initializes a tunnel backend, and the
        # relay transiently refuses new clients — observed 360s hangs on a
        # spec the previous run had already compiled).
        t_orig = bench_conv(pair["orig"], iters=args.iters, probe=False)
        t_s2d = bench_conv(pair["s2d"], iters=args.iters, probe=False)
        row = {
            "name": pair["name"], "count": pair["count"],
            "orig_ms": round(t_orig * 1e3, 4), "s2d_ms": round(t_s2d * 1e3, 4),
            "speedup": round(t_orig / max(t_s2d, 1e-12), 3),
            "orig_spec": pair["orig"], "s2d_spec": pair["s2d"],
        }
        rows.append(row)
        tot_orig += pair["count"] * t_orig
        tot_s2d += pair["count"] * t_s2d
        print(f"  {pair['name']}: orig {t_orig*1e3:.3f} ms, s2d "
              f"{t_s2d*1e3:.3f} ms -> {row['speedup']}x "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if args.json:  # partial results survive a kill mid-run
            with open(args.json, "w", encoding="utf-8") as fh:
                json.dump({"tool": "s2d_microbench", "hardware": kind,
                           "batch": args.batch, "partial": True,
                           "pairs": rows}, fh, indent=1)

    out = {
        "tool": "s2d_microbench", "hardware": kind, "batch": args.batch,
        "dtype": "bf16",
        "fwd_fullres_conv_ms_orig": round(tot_orig * 1e3, 3),
        "fwd_fullres_conv_ms_s2d": round(tot_s2d * 1e3, 3),
        "fwd_fullres_speedup": round(tot_orig / max(tot_s2d, 1e-12), 3),
        "pairs": rows,
        "note": ("standalone best-case per-conv times; counts weight the "
                 "flagship fwd encode+decode program. The train step also "
                 "runs these convs' input/filter grads — the s2d form's "
                 "backward stays in the large-channel domain, so the fwd "
                 "speedup is a lower bound on the exchange's reach."),
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
