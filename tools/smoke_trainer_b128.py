#!/usr/bin/env python
"""b128 trainer epoch-overhead smoke (VERDICT round-2 item 4).

Round-2 measured 15-24 s wall-clock per b128 epoch of which ~2.6 s was
device time — the rest was per-batch validation syncs, triplet dumps, and
double synchronous checkpoint fetches. This drives the REAL ``VAETrainer``
(train_vae CLI) at the flagship architecture, 256 synthetic images, batch
128, cache_rate 1.0, for several epochs and reports wall-clock per epoch vs
the known device floor. Target: epoch wall within ~2x device time.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_trainer_b128.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--batch", type=int, default=128)
    args = parser.parse_args(argv)

    import jax

    if jax.default_backend() == "tpu":
        # TPU-only: foreign-host CPU AOT cache entries are a SIGILL risk
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pti_ldm_vae_tpu.config import load_config
    from pti_ldm_vae_tpu.data.io import write_tif

    work = tempfile.mkdtemp(prefix="trainer_b128_")
    data_dir = os.path.join(work, "data", "dente")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(0.1, 1.0, size=(256, 256)).astype(np.float32)
    for i in range(args.images):
        img = np.roll(base, i * 3, axis=1).copy()
        img[:20] = 0.0
        write_tif(os.path.join(data_dir, f"dente_{i:03d}.tif"), img)

    cfg = load_config("/root/repo/config/vae_dente_no_adv.json")
    cfg["data_base_dir"] = os.path.join(work, "data")
    cfg["run_dir"] = os.path.join(work, "run")
    cfg["autoencoder_train"]["batch_size"] = args.batch
    cfg["autoencoder_train"]["max_epochs"] = args.epochs
    cfg["wandb"] = {"enabled": False}
    cfg_path = os.path.join(work, "cfg.json")
    with open(cfg_path, "w", encoding="utf-8") as fh:
        json.dump(cfg, fh)

    from pti_ldm_vae_tpu.cli.train_vae import main as train_main

    t0 = time.time()
    train_main(["-c", cfg_path, "--no-wandb", "--num-workers", "8",
                "--cache-rate", "1.0"])
    total = time.time() - t0

    epochs = []
    with open(os.path.join(cfg["run_dir"], "metrics.jsonl"), encoding="utf-8") as fh:
        for line in fh:
            row = json.loads(line)
            if "time_per_epoch" in row:
                epochs.append(row["time_per_epoch"])
    # epoch 0 includes both jit compiles; steady state is the story
    steady = epochs[1:] if len(epochs) > 1 else epochs
    print(json.dumps({
        "stage": "trainer_b128_smoke",
        "images": args.images, "batch": args.batch, "epochs": args.epochs,
        "total_wall_s": round(total, 1),
        "epoch_wall_s": [round(e, 2) for e in epochs],
        "steady_epoch_s_best": round(min(steady), 2) if steady else None,
        "note": "round-2 baseline: 15-24 s/epoch wall vs ~2.6 s device",
    }), flush=True)


if __name__ == "__main__":
    main()
