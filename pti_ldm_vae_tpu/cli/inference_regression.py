"""Regression inference CLI (reference ``reg_scripts/inference_regression.py``):
predictions per image -> predictions.json."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from ..data.factory import create_regression_inference_dataloader
from ..utils.cli_common import init_device_and_seed, load_json_config, resolve_run_dir
from ..utils.regression_utils import (
    NORM_STATS_FILENAME,
    build_regression_model_from_config,
    extract_regression_data_config,
    extract_regression_train_config,
    load_regression_checkpoint,
    load_target_normalizer,
)

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Run regression head inference (TPU).")
    parser.add_argument("-c", "--config-file", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--num-workers", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    config = load_json_config(args.config_file)
    data_cfg = extract_regression_data_config(config)
    train_cfg = extract_regression_train_config(config)
    if args.batch_size is not None:
        train_cfg["batch_size"] = args.batch_size
    if args.num_workers is not None:
        data_cfg["num_workers"] = args.num_workers
    run_dir = resolve_run_dir(config, args.config_file)
    init_device_and_seed(args.seed)

    targets: list[str] = config["targets"]
    model, _ = build_regression_model_from_config(config, targets)
    head_template = model.init_head(jax.random.key(0))
    head_params, _ = load_regression_checkpoint(Path(args.checkpoint), targets, head_template)

    dataloader, image_paths = create_regression_inference_dataloader(
        input_dir=args.input_dir,
        patch_size=tuple(data_cfg["patch_size"]),
        batch_size=train_cfg["batch_size"],
        num_samples=args.num_samples,
        num_workers=data_cfg.get("num_workers", 4),
    )

    norm_path = run_dir / "trained_weights" / NORM_STATS_FILENAME
    normalizer = load_target_normalizer(norm_path, targets) if norm_path.exists() else None

    predict = jax.jit(lambda params, images: model.apply(params, images))
    preds_all = []
    for batch in dataloader:
        preds = np.asarray(predict(head_params, batch["image"]))
        if normalizer is not None:
            preds = normalizer.denormalize(preds)
        preds_all.append(preds[: int(batch["mask"].sum())])
    stacked = np.concatenate(preds_all, axis=0)

    output_dir = Path(args.output_dir) if args.output_dir else run_dir / "inference"
    output_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "targets": targets,
        "predictions": [
            {"file": path, **{t: float(v) for t, v in zip(targets, row)}}
            for path, row in zip(image_paths, stacked)
        ],
    }
    (output_dir / "predictions.json").write_text(json.dumps(payload, indent=2), encoding="utf-8")
    print(f"Inference complete. Predictions written to {output_dir / 'predictions.json'}")
    return payload


if __name__ == "__main__":
    main()
