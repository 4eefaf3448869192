"""Regression training utilities.

Equivalent of reference ``src/pti_ldm_vae/utils/regression_utils.py``: config
schema normalization across legacy/new layouts (``:17-120``), target
normalization with persisted stats (``:239-306``), loss builders (``:309-315``),
train/val epoch loops (``:318-388``), head checkpoints with target-order
validation (``:391-477``), and the frozen-VAE + MLP model builder (``:480-515``).

TPU-first: the per-batch step (frozen encode -> MLP -> loss -> Adam on head
params only) is one jitted program; the VAE encode runs in the model's
compute dtype while the loss/optimizer stay f32.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint.orbax_io import load_pytree, save_pytree
from ..models.regressor import LatentRegressor, VAELatentRegressor, infer_flat_dim_from_patch
from .metrics import compute_regression_metrics
from .vae_loader import load_vae_config, load_vae_model

__all__ = [
    "extract_regression_data_config",
    "extract_regression_train_config",
    "extract_regression_eval_config",
    "extract_regressor_def_config",
    "regression_loss_key",
    "TargetNormalizer",
    "compute_target_normalizer",
    "save_target_normalizer",
    "load_target_normalizer",
    "build_loss_fn",
    "make_regression_steps",
    "train_one_epoch",
    "validate_one_epoch",
    "save_regression_checkpoint",
    "load_regression_checkpoint",
    "save_last_regression_checkpoint",
    "maybe_save_best_regression_checkpoint",
    "build_regression_model_from_config",
    "NORM_STATS_FILENAME",
]

NORM_STATS_FILENAME = "target_norm_stats.json"


# ---------------------------------------------------------------- config ----
def extract_regression_data_config(config: dict[str, Any]) -> dict[str, Any]:
    """Normalize data config across schemas (reference ``:17-48``)."""
    data_cfg = dict(config.get("data", {}))
    legacy = config.get("train", {})
    data_cfg.setdefault("data_base_dir", config.get("data_base_dir"))
    data_cfg.setdefault("attributes_path", config.get("attributes_path"))
    data_cfg.setdefault("data_source", config.get("data_source", "edente"))
    data_cfg.setdefault("train_split", config.get("train_split", 0.9))
    data_cfg.setdefault("val_dir", config.get("val_dir"))
    data_cfg.setdefault("patch_size", config.get("patch_size"))
    data_cfg.setdefault("cache_rate", config.get("cache_rate", legacy.get("cache_rate", 0.0)))
    data_cfg.setdefault("num_workers", config.get("num_workers", legacy.get("num_workers", 4)))
    data_cfg.setdefault("seed", config.get("seed", legacy.get("seed")))
    data_cfg.setdefault("subset_size", config.get("subset_size", legacy.get("subset_size")))
    data_cfg.setdefault("normalize_attributes", config.get("normalize_attributes"))
    required = ["data_base_dir", "attributes_path", "patch_size"]
    missing = [f for f in required if data_cfg.get(f) is None]
    if missing:
        raise KeyError(f"Missing required data config fields: {missing}")
    return data_cfg


def extract_regression_train_config(config: dict[str, Any]) -> dict[str, Any]:
    """Reference ``:51-73``."""
    train_cfg = dict(config.get("regression_train") or config.get("train") or {})
    required = ["batch_size", "lr", "max_epochs"]
    missing = [f for f in required if train_cfg.get(f) is None]
    if missing:
        raise KeyError(f"Missing required training config fields: {missing}")
    train_cfg.setdefault("val_interval", 1)
    train_cfg.setdefault("target_norm", "none")
    train_cfg.setdefault("loss", "mse")
    train_cfg.setdefault("weight_decay", 0.0)
    return train_cfg


def extract_regression_eval_config(
    config: dict[str, Any], data_cfg: dict[str, Any] | None = None
) -> dict[str, Any]:
    """Reference ``:76-104``."""
    base = data_cfg or extract_regression_data_config(config)
    eval_cfg = dict(config.get("evaluation", {}))
    eval_cfg.setdefault("data_base_dir", base.get("data_base_dir"))
    eval_cfg.setdefault("attributes_path", base.get("attributes_path"))
    eval_cfg.setdefault("data_source", base.get("data_source", "edente"))
    eval_cfg.setdefault("patch_size", base.get("patch_size"))
    eval_cfg.setdefault("num_workers", base.get("num_workers", 4))
    eval_cfg.setdefault("normalize_attributes", base.get("normalize_attributes"))
    required = ["data_base_dir", "attributes_path", "patch_size"]
    missing = [f for f in required if eval_cfg.get(f) is None]
    if missing:
        raise KeyError(f"Missing required evaluation config fields: {missing}")
    return eval_cfg


def extract_regressor_def_config(config: dict[str, Any]) -> dict[str, Any]:
    """Reference ``:107-120``."""
    reg_cfg = dict(config.get("regressor_def") or config.get("regressor") or {})
    reg_cfg.setdefault("hidden_dims", [])
    reg_cfg.setdefault("dropout", 0.0)
    reg_cfg.setdefault("activation", "relu")
    return reg_cfg


def regression_loss_key(train_cfg: dict[str, Any]) -> str:
    loss_name = str(train_cfg.get("loss", "mse")).lower()
    return "loss_huber" if loss_name in {"smooth_l1", "huber"} else "loss_mse"


# ------------------------------------------------------------ normalizer ----
class TargetNormalizer:
    """Standard scaling of target vectors (reference ``:239-291``)."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        mean = np.asarray(mean, dtype=np.float32)
        std = np.asarray(std, dtype=np.float32)
        if mean.shape != std.shape:
            raise ValueError("Mean and std must share the same shape.")
        self.mean = mean
        self.std = np.where(std == 0, 1.0, std)

    def normalize(self, targets):
        return (targets - self.mean) / self.std

    def denormalize(self, values):
        return values * self.std + self.mean

    def to_dict(self, target_names: list[str]) -> dict[str, Any]:
        return {
            "target_names": target_names,
            "mean": self.mean.tolist(),
            "std": self.std.tolist(),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any], target_names: list[str]) -> "TargetNormalizer":
        stored = data.get("target_names", [])
        if stored and list(stored) != list(target_names):
            raise ValueError(f"Target order mismatch: expected {target_names}, found {stored}")
        return cls(np.asarray(data["mean"]), np.asarray(data["std"]))


def compute_target_normalizer(targets: np.ndarray) -> TargetNormalizer:
    targets = np.asarray(targets, dtype=np.float32)
    return TargetNormalizer(targets.mean(axis=0), targets.std(axis=0))


def save_target_normalizer(path: Path, normalizer: TargetNormalizer, target_names: list[str]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(normalizer.to_dict(target_names), indent=2), encoding="utf-8")


def load_target_normalizer(path: Path, target_names: list[str]) -> TargetNormalizer:
    return TargetNormalizer.from_dict(
        json.loads(Path(path).read_text(encoding="utf-8")), target_names
    )


# ------------------------------------------------------------------ loss ----
def build_loss_fn(loss_name: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """MSE or SmoothL1/Huber with torch defaults (beta=1.0), reference ``:309-315``."""
    name = loss_name.lower()
    if name in {"mse", "mse_loss"}:
        return lambda pred, tgt: jnp.mean(jnp.square(pred - tgt))
    if name in {"smooth_l1", "huber"}:

        def smooth_l1(pred, tgt):
            diff = jnp.abs(pred - tgt)
            return jnp.mean(jnp.where(diff < 1.0, 0.5 * jnp.square(diff), diff - 0.5))

        return smooth_l1
    raise ValueError(f"Unsupported loss '{loss_name}'. Use 'mse' or 'smooth_l1'.")


# ----------------------------------------------------------------- steps ----
def make_regression_steps(
    model: VAELatentRegressor,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    normalizer: TargetNormalizer | None,
):
    """Jitted (train_step, eval_step) over (head_params, opt_state)."""
    if normalizer is not None:
        norm_mean = jnp.asarray(normalizer.mean)
        norm_std = jnp.asarray(normalizer.std)

    def _norm(t):
        return (t - norm_mean) / norm_std if normalizer is not None else t

    def _denorm(t):
        return t * norm_std + norm_mean if normalizer is not None else t

    @jax.jit
    def train_step(head_params, opt_state, images, targets, mask, dropout_rng):
        tgt = _norm(targets)

        def loss_of(params):
            preds = model.regressor.apply(
                params, model.encode_flat(images), deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            # Per-element criterion, masked mean over valid samples (padding-safe).
            per_sample = _per_sample_loss(preds, tgt)
            return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_of)(head_params)
        updates, new_opt = tx.update(grads, opt_state, head_params)
        return optax.apply_updates(head_params, updates), new_opt, loss

    def _per_sample_loss(preds, tgt):
        name = getattr(loss_fn, "__name__", "")
        diff = preds - tgt
        if name == "smooth_l1":
            ad = jnp.abs(diff)
            per = jnp.where(ad < 1.0, 0.5 * jnp.square(ad), ad - 0.5)
        else:
            per = jnp.square(diff)
        return jnp.mean(per, axis=1)

    @jax.jit
    def eval_step(head_params, images, targets, mask):
        preds = model.apply(head_params, images)
        per_sample = _per_sample_loss(preds, _norm(targets))
        loss = jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, _denorm(preds)

    return train_step, eval_step


def train_one_epoch(train_step, head_params, opt_state, loader, rng):
    """Reference ``train_one_epoch`` (``:318-347``): returns epoch-mean loss."""
    total, n = 0.0, 0
    for batch in loader:
        rng, sub = jax.random.split(rng)
        head_params, opt_state, loss = train_step(
            head_params, opt_state,
            jnp.asarray(batch["image"]), jnp.asarray(batch["target"]),
            jnp.asarray(batch["mask"]), sub,
        )
        total += float(loss)
        n += 1
    if n == 0:
        raise RuntimeError("Training dataloader produced zero batches.")
    return head_params, opt_state, total / n, rng


def validate_one_epoch(eval_step, head_params, loader, target_names):
    """Reference ``validate_one_epoch`` (``:350-388``): (loss, metrics dict)."""
    total, n = 0.0, 0
    preds_all, targets_all = [], []
    for batch in loader:
        loss, preds = eval_step(
            head_params, jnp.asarray(batch["image"]),
            jnp.asarray(batch["target"]), jnp.asarray(batch["mask"]),
        )
        total += float(loss)
        n += 1
        valid = int(batch["mask"].sum())
        preds_all.append(np.asarray(preds)[:valid])
        targets_all.append(np.asarray(batch["target"])[:valid])
    if n == 0:
        raise RuntimeError("Validation dataloader produced zero batches.")
    metrics = compute_regression_metrics(
        np.concatenate(preds_all), np.concatenate(targets_all), target_names
    )
    return total / n, metrics


# ------------------------------------------------------------ checkpoints ----
def save_regression_checkpoint(
    path: Path, head_params: Any, targets: list[str],
    epoch: int | None = None, latent_dim: int | None = None,
) -> None:
    """Head weights + sidecar metadata (reference ``:391-407``)."""
    path = Path(path)
    save_pytree(str(path), head_params)
    meta = {"targets": list(targets), "epoch": epoch, "latent_dim": latent_dim}
    Path(str(path) + ".json").write_text(json.dumps(meta), encoding="utf-8")


def load_regression_checkpoint(
    path: Path, expected_targets: list[str], head_params_template: Any = None
) -> tuple[Any, dict[str, Any]]:
    """Load head weights; validates target order (reference ``:410-431``).

    Accepts this framework's orbax dirs or reference torch ``.pth`` head
    checkpoints (``regressor_state_dict`` with ``mlp.{i}.weight/bias``).
    """
    path = Path(path)
    if path.is_dir():
        meta_path = Path(str(path) + ".json")
        meta = json.loads(meta_path.read_text(encoding="utf-8")) if meta_path.exists() else {}
        stored = meta.get("targets")
        if stored and list(stored) != list(expected_targets):
            raise ValueError(
                f"Target mismatch: expected {expected_targets}, found {stored}."
            )
        params = load_pytree(str(path), head_params_template)
        return params, meta
    # torch checkpoint
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    stored = ckpt.get("targets")
    if stored and list(stored) != list(expected_targets):
        raise ValueError(f"Target mismatch: expected {expected_targets}, found {stored}.")
    sd = {k: np.asarray(v) for k, v in ckpt["regressor_state_dict"].items()}
    # mlp.{2i}.weight -> dense_{i}; the torch Sequential interleaves
    # activations/dropout, so map linear layers in order of appearance.
    linear_ids = sorted(
        {int(k.split(".")[1]) for k in sd if k.endswith(".weight")}
    )
    params: dict[str, Any] = {}
    names = [f"dense_{i}" for i in range(len(linear_ids) - 1)] + ["dense_out"]
    for name, lid in zip(names, linear_ids):
        params[name] = {
            "kernel": sd[f"mlp.{lid}.weight"].T,
            "bias": sd[f"mlp.{lid}.bias"],
        }
    return {"params": params}, {k: v for k, v in ckpt.items() if k != "regressor_state_dict"}


def save_last_regression_checkpoint(weights_dir: Path, head_params, targets, epoch) -> Path:
    path = Path(weights_dir) / "head_last"
    save_regression_checkpoint(path, head_params, targets, epoch)
    return path


def maybe_save_best_regression_checkpoint(
    weights_dir: Path, head_params, targets, epoch, val_loss, best_val_loss,
    best_path: Path | None = None,
) -> tuple[float, Path]:
    path = best_path or Path(weights_dir) / "head_best"
    if val_loss < best_val_loss:
        save_regression_checkpoint(path, head_params, targets, epoch)
        return val_loss, path
    return best_val_loss, path


# ----------------------------------------------------------------- model ----
def build_regression_model_from_config(
    config: dict[str, Any], targets: list[str], *, compute_dtype=None
) -> tuple[VAELatentRegressor, int]:
    """Frozen VAE + head from config (reference ``:480-515``)."""
    vae_cfg = load_vae_config(config["vae"]["config_file"])
    kwargs = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    vae, vae_variables = load_vae_model(vae_cfg, config["vae"]["checkpoint"], **kwargs)

    data_cfg = extract_regression_data_config(config)
    reg_cfg = extract_regressor_def_config(config)
    patch_size = tuple(data_cfg["patch_size"])

    latent_dim = infer_flat_dim_from_patch(vae, vae_variables, patch_size)
    regressor = LatentRegressor(
        hidden_dims=tuple(reg_cfg.get("hidden_dims", [])),
        output_dim=len(targets),
        dropout=float(reg_cfg.get("dropout", 0.0)),
        activation=reg_cfg.get("activation", "relu"),
    )
    model = VAELatentRegressor(vae, vae_variables, regressor, latent_dim=latent_dim)
    return model, latent_dim
