#!/usr/bin/env python
"""Host-pipeline throughput: can the loader feed the chip?

Generates realistic 512x1024 float32 grayscale TIFs, then measures
``ShardedDataLoader`` epoch throughput (decode -> area-resize to patch ->
mask z-score, batch 128) in three modes:

* native   — C++ fused decode+resize+normalize path (production default),
* python   — the bit-compatible numpy fallback,
* cached   — second epoch with cache_rate=1.0 (RAM cache hit path).

Output: one JSON line per mode with imgs/s and imgs/s/core, plus the
device-demand comparison against the recorded b128 train throughput
(BENCH train_best, ~399 imgs/s on v5e): the pipeline is input-bound iff
its imgs/s < the chip's. Run anywhere (host-only; no TPU needed).

    python tools/loader_bench.py [--images 256] [--batch 128] [--keep DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, hw=(512, 1024)) -> list[str]:
    from pti_ldm_vae_tpu.data.io import write_tif

    rng = np.random.default_rng(0)
    paths = []
    os.makedirs(root, exist_ok=True)
    base = rng.uniform(0.1, 1.0, size=hw).astype(np.float32)
    for i in range(n):
        # vary content cheaply (dataset-size realism without n full randoms)
        img = np.roll(base, i * 7, axis=1).copy()
        img[: 40 + (i % 13)] = 0.0  # background band exercises the mask path
        path = os.path.join(root, f"dente_{i:04d}.tif")
        write_tif(path, img)
        paths.append(path)
    return paths


def run_epoch(loader) -> tuple[float, int]:
    start = time.perf_counter()
    n = 0
    for batch in loader:
        n += int(batch["mask"].sum())
    return time.perf_counter() - start, n


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", type=int, default=256)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--patch", type=int, nargs=2, default=(256, 256))
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--keep", default=None, help="Reuse/keep dataset dir")
    parser.add_argument("--device-demand", type=float, default=399.0,
                        help="Chip-side imgs/s to compare against (b128 train)")
    args = parser.parse_args(argv)

    from pti_ldm_vae_tpu import native
    from pti_ldm_vae_tpu.data.io import read_image
    from pti_ldm_vae_tpu.data.loader import ShardedDataLoader
    from pti_ldm_vae_tpu.data.transforms import preprocess_image_np

    root = args.keep or tempfile.mkdtemp(prefix="loader_bench_")
    existing = (
        sorted(os.path.join(root, f) for f in os.listdir(root) if f.endswith(".tif"))
        if os.path.isdir(root) else []
    )
    paths = existing if len(existing) >= args.images else make_dataset(root, args.images)
    cores = os.cpu_count() or 1
    native_ok = native.preprocess_tiff(paths[0], tuple(args.patch)) is not None

    def python_transform(path, _patch=tuple(args.patch)):
        return preprocess_image_np(read_image(path), _patch)

    modes = [("native", None)] if native_ok else []
    modes.append(("python", python_transform))

    results = {}
    for name, transform in modes:
        loader = ShardedDataLoader(
            paths, tuple(args.patch), args.batch, cache_rate=0.0,
            num_workers=args.workers, transform=transform,
        )
        elapsed, n = run_epoch(loader)  # cold: every image decoded
        results[name] = {
            "mode": name, "images": n, "seconds": round(elapsed, 2),
            "imgs_per_sec": round(n / elapsed, 1),
            "imgs_per_sec_per_core": round(n / elapsed / cores, 1),
            "cores": cores, "workers": args.workers,
        }
        print(json.dumps(results[name]), flush=True)

    cached = ShardedDataLoader(
        paths, tuple(args.patch), args.batch, cache_rate=1.0, num_workers=args.workers
    )
    run_epoch(cached)  # warm the cache
    elapsed, n = run_epoch(cached)
    results["cached"] = {
        "mode": "cached", "images": n, "seconds": round(elapsed, 2),
        "imgs_per_sec": round(n / elapsed, 1), "cores": cores,
    }
    print(json.dumps(results["cached"]), flush=True)

    primary = results.get("native", results["python"])
    verdict = {
        "device_demand_imgs_per_sec": args.device_demand,
        "host_supply_imgs_per_sec": primary["imgs_per_sec"],
        "input_bound_on_this_host": primary["imgs_per_sec"] < args.device_demand,
        "cores_needed_for_device_demand": round(
            args.device_demand / max(primary["imgs_per_sec_per_core"], 1e-9), 1
        ),
    }
    print(json.dumps(verdict), flush=True)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
