"""Regression evaluation CLI (reference ``reg_scripts/evaluate_regression.py``):
reload VAE + head, MAE/MSE per target + aggregate -> metrics.json."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..data.factory import create_regression_eval_dataloader
from ..utils.cli_common import (
    init_device_and_seed,
    load_json_config,
    resolve_run_dir,
    serialize_args,
)
from ..utils.regression_utils import (
    NORM_STATS_FILENAME,
    build_loss_fn,
    build_regression_model_from_config,
    extract_regression_data_config,
    extract_regression_eval_config,
    extract_regression_train_config,
    load_regression_checkpoint,
    load_target_normalizer,
    make_regression_steps,
    validate_one_epoch,
)

__all__ = ["main"]


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Evaluate a trained regression head (TPU).")
    parser.add_argument("-c", "--config-file", required=True)
    parser.add_argument("--checkpoint", required=True, help="Head checkpoint (orbax dir or .pth)")
    parser.add_argument("--input-dir", type=str, default=None)
    parser.add_argument("--attributes-path", type=str, default=None)
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--num-workers", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def load_optional_normalizer(run_dir: Path, targets):
    norm_path = Path(run_dir) / "trained_weights" / NORM_STATS_FILENAME
    if norm_path.exists():
        return load_target_normalizer(norm_path, targets)
    return None


def main(argv=None) -> dict:
    args = parse_args(argv)
    config = load_json_config(args.config_file)
    data_cfg = extract_regression_data_config(config)
    train_cfg = extract_regression_train_config(config)
    eval_cfg = extract_regression_eval_config(config, data_cfg)
    if args.batch_size is not None:
        train_cfg["batch_size"] = args.batch_size
    if args.num_workers is not None:
        eval_cfg["num_workers"] = args.num_workers
    if args.attributes_path is not None:
        eval_cfg["attributes_path"] = args.attributes_path
    run_dir = resolve_run_dir(config, args.config_file)
    init_device_and_seed(args.seed)

    import jax

    targets: list[str] = config["targets"]
    model, _ = build_regression_model_from_config(config, targets)
    head_template = model.init_head(jax.random.key(0))
    head_params, _ = load_regression_checkpoint(Path(args.checkpoint), targets, head_template)

    input_dir = args.input_dir or eval_cfg["data_base_dir"]
    dataloader, image_paths = create_regression_eval_dataloader(
        input_dir,
        eval_cfg["attributes_path"],
        targets,
        batch_size=train_cfg["batch_size"],
        patch_size=tuple(eval_cfg["patch_size"]),
        num_workers=eval_cfg.get("num_workers", 4),
        num_samples=args.num_samples,
        data_source=eval_cfg.get("data_source", "edente"),
        normalize_attributes=eval_cfg.get("normalize_attributes"),
    )

    normalizer = load_optional_normalizer(run_dir, targets)
    loss_fn = build_loss_fn(train_cfg.get("loss", "mse"))
    import optax

    _, eval_step = make_regression_steps(model, loss_fn, optax.adam(1e-3), normalizer)
    val_loss, metrics = validate_one_epoch(eval_step, head_params, dataloader, targets)

    output_dir = Path(args.output_dir) if args.output_dir else run_dir / "eval"
    output_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "args": serialize_args(args),
        "metrics": {"val_loss": val_loss, **metrics},
        "files": image_paths,
    }
    (output_dir / "metrics.json").write_text(json.dumps(payload, indent=2), encoding="utf-8")
    print(f"Evaluation complete. Metrics written to {output_dir / 'metrics.json'}")
    return payload["metrics"]


if __name__ == "__main__":
    main()
