"""Every reference config file drives its CLI end-to-end (schema contract).

The reference's own JSON configs are loaded from the read-only mount, only
environment-bound knobs are overridden (data dirs, run dir, patch size,
epochs — the same knobs a user would change), and the result drives the real
CLI. This catches schema drift in exactly the layouts the reference ships:
the KL-sweep AR config (``ar_vae_dente_kl1e3``), the adversarial
``vae_dente_2``, and the normalized-regression ``nreg_*`` layouts
(reference ``config/*.json``; driver BASELINE configs[0-3]).
"""

import copy
import json
import os

import numpy as np
import pytest

from pti_ldm_vae_tpu.data.io import write_tif

REF_CONFIG_DIR = "/root/reference/config"

VAE_CONFIGS = [
    "vae_dente_no_adv",
    "vae_edente_no_adv",
    "vae_both_no_adv",
    "vae_dente_2",
    "ar_vae_dente",
    "ar_vae_dente_kl1e3",
]
REG_CONFIGS = [
    "reg_edente_from_dente",
    "reg_edente_from_both",
    "nreg_edente_from_dente",
    "nreg_edente_from_both",
]

ATTR_KEYS = ("height_0", "width_0", "width_1", "width_2", "width_3", "width_4")


def _ref_config(name: str) -> dict:
    with open(os.path.join(REF_CONFIG_DIR, f"{name}.json"), encoding="utf-8") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny dente+edente TIF datasets + an attribute file with all six
    geometric attributes (keyed by basename, the join contract of
    ``attributes_for_paths``)."""
    root = tmp_path_factory.mktemp("refcfg_ws")
    rng = np.random.default_rng(0)
    attrs = {}
    for source in ("dente", "edente"):
        d = root / "data" / source
        d.mkdir(parents=True)
        for i in range(12):
            img = rng.uniform(0.1, 1.0, size=(32, 32)).astype(np.float32)
            img[:4] = 0.0  # background rows exercise the mask z-score
            name = f"{source}_{i:03d}.tif"
            write_tif(str(d / name), img)
            attrs[name] = {k: float(i + j) for j, k in enumerate(ATTR_KEYS)}
    attr_path = root / "attributes.json"
    attr_path.write_text(json.dumps(attrs))
    return root, attr_path


def _localize_vae_config(cfg: dict, root, attr_path, run_name: str) -> dict:
    cfg = copy.deepcopy(cfg)
    cfg["data_base_dir"] = str(root / "data")
    cfg["run_dir"] = str(root / "runs" / run_name)
    train = cfg["autoencoder_train"]
    train["patch_size"] = [32, 32]
    train["batch_size"] = 4
    if "regularized_attributes" in cfg:
        cfg["regularized_attributes"]["attribute_file"] = str(attr_path)
    cfg.setdefault("wandb", {})["enabled"] = False
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("name", VAE_CONFIGS)
def test_reference_vae_config_trains(workspace, name):
    root, attr_path = workspace
    from pti_ldm_vae_tpu.cli.train_vae import main

    cfg = _localize_vae_config(_ref_config(name), root, attr_path, name)
    adv = bool(cfg["autoencoder_train"].get("adv_enabled", False))
    # Adversarial branch only activates past the reference's epoch>5 warm-up
    # gate — run 7 epochs so the GAN phase (second jitted step) executes.
    epochs = 7 if adv else 1
    cfg_path = root / f"{name}.json"
    cfg_path.write_text(json.dumps(cfg))

    result = main([
        "-c", str(cfg_path), "--no-wandb", "--f32", "--num-workers", "2",
        "--subset-size", "8", "--max-epochs", str(epochs),
    ])
    run_dir = root / "runs" / name
    assert (run_dir / "trained_weights" / "autoencoder_last").exists()
    assert np.isfinite(result["best_val_loss"])

    lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    gen_keys = {k for line in lines for k in line}
    assert "train/recon_loss" in gen_keys
    # (ar_vae_enabled is the raw "@regularized_attributes.enabled" ref here)
    if cfg.get("regularized_attributes", {}).get("enabled") is True:
        assert "train/ar_loss_total" in gen_keys
    if adv:
        # GAN phase engaged after the warm-up gate lifts: the discriminator
        # scalar is zero during warm-up and real once epoch > 5.
        d_vals = [line["train/adv_disc_loss"] for line in lines
                  if "train/adv_disc_loss" in line]
        assert any(abs(v) > 0 for v in d_vals)


def _localize_reg_config(cfg: dict, root, attr_path, vae_cfg_path, vae_ckpt, run_name: str) -> dict:
    cfg = copy.deepcopy(cfg)
    cfg["run_dir"] = str(root / "runs" / run_name)
    for section in ("data", "evaluation"):
        if section in cfg:
            cfg[section]["data_base_dir"] = str(root / "data")
            cfg[section]["attributes_path"] = str(attr_path)
            cfg[section]["patch_size"] = [32, 32]
            cfg[section]["num_workers"] = 2
    cfg["vae"]["config_file"] = str(vae_cfg_path)
    cfg["vae"]["checkpoint"] = str(vae_ckpt)
    cfg.setdefault("wandb", {})["enabled"] = False
    return cfg


@pytest.fixture(scope="module")
def tiny_vae_ckpt(workspace):
    """A saved VAE built from the REFERENCE vae_dente_no_adv architecture
    (patch localized to 32) for the regression configs to point at."""
    import jax
    import jax.numpy as jnp

    from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
    from pti_ldm_vae_tpu.config import resolve_refs
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config

    root, attr_path = workspace
    cfg = _localize_vae_config(_ref_config("vae_dente_no_adv"), root, attr_path, "reg_vae")
    cfg_path = root / "reg_vae_config.json"
    cfg_path.write_text(json.dumps(cfg))
    resolved = resolve_refs(copy.deepcopy(cfg))
    model = autoencoder_from_config(resolved["autoencoder_def"], compute_dtype=jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1), jnp.float32), jax.random.key(1)
    )
    ckpt = root / "reg_vae_ckpt"
    save_pytree(str(ckpt), variables)
    return cfg_path, ckpt


@pytest.mark.slow
@pytest.mark.parametrize("name", REG_CONFIGS)
def test_reference_regression_config_trains_and_evaluates(workspace, tiny_vae_ckpt, name):
    root, attr_path = workspace
    vae_cfg_path, vae_ckpt = tiny_vae_ckpt
    from pti_ldm_vae_tpu.cli.evaluate_regression import main as eval_main
    from pti_ldm_vae_tpu.cli.train_regression import main as train_main

    cfg = _localize_reg_config(_ref_config(name), root, attr_path, vae_cfg_path, vae_ckpt, name)
    cfg_path = root / f"{name}.json"
    cfg_path.write_text(json.dumps(cfg))

    result = train_main(["-c", str(cfg_path), "--max-epochs", "2", "--subset-size", "8"])
    weights = root / "runs" / name / "trained_weights"
    assert (weights / "head_best").exists()
    assert np.isfinite(result["best_val"])
    # nreg_* = standard target normalization with persisted stats; reg_* = none.
    normalized = name.startswith("nreg")
    assert (weights / "target_norm_stats.json").exists() is normalized

    metrics = eval_main(["-c", str(cfg_path), "--checkpoint", str(weights / "head_best")])
    assert np.isfinite(metrics["val_loss"])
    for key in ATTR_KEYS:
        assert np.isfinite(metrics[f"mae_{key}"])
