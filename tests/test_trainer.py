"""End-to-end trainer smoke tests on a synthetic dataset (SURVEY.md §4:
the reference's own harness is exactly this — short run, loss decreases,
checkpoints and samples appear)."""

import json
import os

import numpy as np
import pytest

from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.train.loop import VAETrainer, resolve_ar_settings


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    (root / "dente").mkdir()
    for i in range(16):
        img = rng.uniform(0.1, 1.0, size=(32, 32)).astype(np.float32)
        img[:4] = 0.0
        write_tif(str(root / "dente" / f"dente_{i:03d}.tif"), img)
    return root


def _config(dataset_dir, run_dir, **train_overrides):
    train = {
        "batch_size": 4,
        "patch_size": [32, 32],
        "lr": 1e-3,
        "perceptual_weight": 0.0,
        "kl_weight": 1e-4,
        "recon_loss": "l1",
        "adv_enabled": False,
        "adv_weight": 0.5,
        "ar_vae_enabled": False,
        "max_epochs": 2,
        "val_interval": 1,
    }
    train.update(train_overrides)
    return {
        "data_base_dir": str(dataset_dir),
        "run_dir": str(run_dir),
        "resume_ckpt": False,
        "data_source": "dente",
        "train_split": 0.75,
        "val_dir": None,
        "spatial_dims": 2,
        "image_channels": 1,
        "latent_channels": 2,
        "autoencoder_def": {
            "spatial_dims": 2,
            "in_channels": 1,
            "out_channels": 1,
            "latent_channels": 2,
            "channels": [8, 16],
            "num_res_blocks": 1,
            "norm_num_groups": 4,
            "norm_eps": 1e-6,
            "attention_levels": [False, False],
            "with_encoder_nonlocal_attn": False,
            "with_decoder_nonlocal_attn": False,
        },
        "autoencoder_train": train,
        "wandb": {"enabled": False},
    }


def test_trainer_end_to_end(dataset, tmp_path):
    run_dir = tmp_path / "run"
    trainer = VAETrainer(
        _config(dataset, run_dir), seed=42, num_workers=2, mixed_precision=False,
    )
    result = trainer.train()
    assert result["best_val_loss"] < 100.0
    assert result["total_step"] == 2 * len(trainer.train_loader)

    # Artifacts: split json, metrics.jsonl, last + best checkpoints.
    split = json.loads((run_dir / "splits" / "vae_split.json").read_text())
    assert len(split["train_files"]) == 12 and len(split["val_files"]) == 4
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_lines = [l for l in lines if "train/loss_total" in l]
    val_lines = [l for l in lines if "val/recon_loss" in l]
    assert len(train_lines) == result["total_step"]
    assert len(val_lines) == 2
    names = os.listdir(run_dir / "trained_weights")
    assert "autoencoder_last" in names
    assert any(n.startswith("checkpoint_epoch") for n in names)


def test_trainer_overwrite_protection(dataset, tmp_path):
    run_dir = tmp_path / "run2"
    cfg = _config(dataset, run_dir)
    VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False).train()
    with pytest.raises(ValueError, match="already exists"):
        VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)


def test_trainer_resume(dataset, tmp_path):
    run_dir = tmp_path / "run3"
    cfg = _config(dataset, run_dir)
    t1 = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    r1 = t1.train()
    cfg2 = _config(dataset, run_dir, max_epochs=3)
    cfg2["resume_ckpt"] = True
    t2 = VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False)
    assert t2.start_epoch >= 1
    assert t2.total_step == r1["total_step"]
    r2 = t2.train()
    assert r2["total_step"] > r1["total_step"]


def test_trainer_with_gan_warmup_transition(dataset, tmp_path):
    """adv_enabled with max_epochs crossing the epoch>5 gate: both compiled
    phases execute."""
    run_dir = tmp_path / "run4"
    cfg = _config(dataset, run_dir, adv_enabled=True, max_epochs=7)
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert trainer._adv_active(5) is False and trainer._adv_active(6) is True
    trainer.train()
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "train/adv_disc_loss" in line
    ]
    warm = [l for l in lines if l["train/adv_disc_loss"] == 0.0]
    active = [l for l in lines if l["train/adv_disc_loss"] != 0.0]
    assert warm and active


def test_trainer_parallelism_block(dataset, tmp_path):
    """`parallelism: {data, spatial}` config block: trainer builds a dp x sp
    mesh and trains through the spatial-sharded path (VERDICT item 8)."""
    run_dir = tmp_path / "run_sp"
    cfg = _config(dataset, run_dir, max_epochs=1)
    cfg["parallelism"] = {"data": 4, "spatial": 2}
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    assert trainer.spatial is True
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    # Numerics match a pure-DP run (spatial partitioning is a layout, not a
    # math change).
    run_dir2 = tmp_path / "run_dp"
    cfg2 = _config(dataset, run_dir2, max_epochs=1)
    VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False).train()
    val_sp = [
        json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    val_dp = [
        json.loads(l) for l in (run_dir2 / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    np.testing.assert_allclose(val_sp, val_dp, rtol=1e-4)


def test_trainer_parallelism_block_validation(dataset, tmp_path):
    cfg = _config(dataset, tmp_path / "run_bad")
    cfg["parallelism"] = {"spatial": 3}  # does not divide 8 devices
    with pytest.raises(ValueError, match="does not divide"):
        VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)


def test_resolve_ar_settings():
    cfg = {
        "autoencoder_train": {"ar_vae_enabled": "false", "ar_vae_weight": "@unresolved.ref"},
        "regularized_attributes": {"enabled": True, "gamma": 0.7},
    }
    ar = resolve_ar_settings(cfg)
    assert ar["enabled"] is True
    assert ar["gamma"] == 0.7
