#!/usr/bin/env python
"""Summarize the round-4 hardware-queue artifacts into paste-ready markdown.

The tunnel-gated queues (tools/tpu_queue_r4.sh, stage B r4b) drop JSON
artifacts under docs/ as they drain. This tool reads whatever exists and
prints a markdown digest for ARCHITECTURE.md / ROUND4.md, so folding the
measurements into the docs is one command even if the relay returns after
the session that queued them is gone.

    python tools/fold_r4_results.py
"""

from __future__ import annotations

import json
import os

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")


def _load(name):
    path = os.path.join(DOCS, name)
    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as fh:
            if name.endswith(".jsonl"):
                return [json.loads(ln) for ln in fh if ln.strip().startswith("{")]
            return json.load(fh)
    except Exception as exc:  # noqa: BLE001 — report, don't die
        return {"_error": f"{type(exc).__name__}: {exc}"}


def main() -> int:
    print("# Round-4 hardware artifacts digest\n")
    missing = []

    d = _load("train_itemize_b128.json")
    if d and "_error" not in d:
        p, dv = d["programs_ms"], d["derived_ms"]
        print("## Train-step itemization b128 (tools/train_step_itemize.py)")
        print(f"- full step {p['full']} ms | fwd {p['vae_fwd']} ms | "
              f"backward {dv['backward_ms']} ms | LPIPS fwd {dv['lpips_fwd_ms']} ms "
              f"| LPIPS fwd+bwd {dv['lpips_fwd_bwd_ms']} ms | optimizer "
              f"{dv['optimizer_ms']} ms")
        model = _load("train_hbm_model_b128.json")
        if model and model.get("predicted_nonconv_ms"):
            print(f"- analytic model predicted non-conv "
                  f"{model['predicted_nonconv_ms']} ms "
                  f"(categories {model['categories_ms']}) — compare rungs above")
        print()
    else:
        missing.append("train_itemize_b128.json")

    for name, label in [
        ("train_itemize_b8.json", "Train-step itemization b8"),
        ("conv_roofline_v5e_train_b128_full.json", "Train conv-roofline b128 (fully priced)"),
        ("conv_roofline_v5e_ddim_b8.json", "DDIM conv-roofline b8"),
    ]:
        d = _load(name)
        if not d or "_error" in d:
            missing.append(name)
            continue
        print(f"## {label} ({name})")
        if "conv_floor_ms" in d:
            print(f"- conv floor {d['conv_floor_ms']} ms | measured "
                  f"{d['measured_step_ms']} ms | util {d['conv_roofline_util']}"
                  f" | extrapolated {d.get('extrapolated_gflops', 0)} GFLOP")
        else:
            print(f"- {json.dumps({k: v for k, v in d.items() if k not in ('programs_ms', 'derived_ms', 'convs')})}")
        print()

    rows = _load("norm_stats_ab_v5e.jsonl")
    if rows:
        print("## GroupNorm stats A/B (tools/run_norm_stats_ab.py)")
        for r in rows:
            if r.get("row") in ("train", "inference"):
                print(f"- {r['row']} b{r['batch']} {r['norm_stats']}: "
                      f"{r.get('imgs_per_sec')} imgs/s ({r.get('step_ms')} ms)")
        tr = {(r["norm_stats"], r["batch"]): r for r in rows if r.get("row") == "train"}
        for b in (8, 128):
            two, one = tr.get(("two_pass", b)), tr.get(("one_pass", b))
            if two and one and two.get("imgs_per_sec"):
                rel = one["imgs_per_sec"] / two["imgs_per_sec"] - 1.0
                print(f"- b{b} one_pass vs two_pass: {rel:+.1%} "
                      f"(model predicted {'+9%' if b == 128 else '+3%'})")
        print("- default flip status: see git log for "
              "'norm_stats default -> one_pass' (tools/flip_norm_stats_default.py)")
        print()
    else:
        missing.append("norm_stats_ab_v5e.jsonl")

    for name, label in [
        ("pti_probe_v5e.jsonl", "PTI occupancy probe (b32/64/128)"),
        ("remat_ab_v5e.jsonl", "Remat A/B (b128 tax, b192/b256 unlock, PTI)"),
    ]:
        rows = _load(name)
        if not rows:
            missing.append(name)
            continue
        print(f"## {label} ({name})")
        for r in rows:
            print(f"- {json.dumps(r)[:200]}")
        print()

    if missing:
        print("## Still missing (tunnel outage — queue will drop them when it drains)")
        for m in missing:
            print(f"- docs/{m}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
