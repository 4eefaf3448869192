#!/usr/bin/env python
"""PTI occupancy probe: bench_pti at a list of batches (round-2/3 question).

PTI inversion is decoder-only fwd+bwd+Adam-on-latent, so MFU should rise
with batch like the other rows — measured, not assumed.  Emits one JSON
line per batch (same schema as bench.py's pti rows).

    python tools/run_pti_probe.py --batches 32 64 128 [--remat]
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

import bench
from __graft_entry__ import FLAGSHIP_CONFIG
from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--remat", action="store_true",
                    help="remat decoder blocks (may unlock larger batches)")
    ap.add_argument("--peak-tf", type=float, default=197.0)
    ap.add_argument("--peak-bw", type=float, default=819.0)
    args = ap.parse_args(argv)

    on_tpu = bench.setup_platform()
    model = autoencoder_from_config(
        FLAGSHIP_CONFIG,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        remat=args.remat,
    )
    images = jnp.zeros((1, bench.HW, bench.HW, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), images, jax.random.key(1))
    peak_tf = args.peak_tf if on_tpu else None
    peak_bw = args.peak_bw if on_tpu else None

    rc = 0
    for b in args.batches:
        try:
            res = bench.bench_pti(model, params, peak_tf=peak_tf,
                                  peak_bw=peak_bw, batch=b)
            print(json.dumps({"row": "pti", "remat": args.remat, "batch": b,
                              **res}), flush=True)
        except Exception as exc:  # noqa: BLE001 — per-batch, keep probing
            print(f"# pti b{b} FAILED: {type(exc).__name__}: {str(exc)[:300]}",
                  flush=True)
            if not bench._is_memory_failure(exc):
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
