"""CLI end-to-end tests: train -> inference -> evaluate on synthetic data."""

import json
import os

import numpy as np
import pytest

from pti_ldm_vae_tpu.data.io import read_image, write_tif

# fast tier excludes this module (train/inference/evaluate CLI end-to-end)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ws")
    data = root / "data" / "dente"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(10):
        img = rng.uniform(0.1, 1.0, size=(32, 32)).astype(np.float32)
        img[:4] = 0.0
        write_tif(str(data / f"dente_{i:03d}.tif"), img)
    cfg = {
        "data_base_dir": str(root / "data"),
        "run_dir": str(root / "runs" / "tiny"),
        "resume_ckpt": False,
        "data_source": "dente",
        "train_split": 0.8,
        "val_dir": None,
        "spatial_dims": 2,
        "image_channels": 1,
        "latent_channels": 2,
        "autoencoder_def": {
            "spatial_dims": "@spatial_dims",
            "in_channels": "@image_channels",
            "out_channels": "@image_channels",
            "latent_channels": "@latent_channels",
            "channels": [8, 16],
            "num_res_blocks": 1,
            "norm_num_groups": 4,
            "norm_eps": 1e-6,
            "attention_levels": [False, False],
            "with_encoder_nonlocal_attn": False,
            "with_decoder_nonlocal_attn": False,
        },
        "autoencoder_train": {
            "batch_size": 4,
            "patch_size": [32, 32],
            "lr": 1e-3,
            "perceptual_weight": 0.0,
            "kl_weight": 1e-4,
            "recon_loss": "l1",
            "adv_enabled": False,
            "adv_weight": 0.5,
            "max_epochs": 1,
            "val_interval": 1,
        },
        "wandb": {"enabled": False},
    }
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    # Loadable (untrained) checkpoint so inference/evaluate don't depend on
    # the slow-marked train test having run first.
    import jax
    import jax.numpy as jnp

    from pti_ldm_vae_tpu.checkpoint.orbax_io import CheckpointManager
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config
    from pti_ldm_vae_tpu.config import resolve_refs

    resolved = resolve_refs(cfg)
    model = autoencoder_from_config(resolved["autoencoder_def"], compute_dtype=jnp.float32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1)), jax.random.key(1)
    )
    ckpt_dir = root / "init_weights"
    CheckpointManager(str(ckpt_dir)).save_last(params, None)
    return root, cfg_path, ckpt_dir / "autoencoder_last"


@pytest.mark.slow
def test_train_cli(workspace):
    root, cfg_path, _ = workspace
    from pti_ldm_vae_tpu.cli.train_vae import main

    # --norm-stats exercises the CLI flag end-to-end; two_pass is the
    # NON-default now (default flipped to one_pass after the v5e A/B),
    # so the flag demonstrably overrides (numerics pinned elsewhere)
    result = main(["-c", str(cfg_path), "--no-wandb", "--f32",
                   "--num-workers", "2", "--norm-stats", "two_pass"])
    assert result["total_step"] == 2  # 8 train imgs / batch 4
    assert (root / "runs" / "tiny" / "trained_weights" / "autoencoder_last").exists()


def test_inference_cli(workspace):
    root, cfg_path, ckpt = workspace
    from pti_ldm_vae_tpu.cli.inference_vae import main

    out = root / "inference_out"
    main([
        "-c", str(cfg_path), "--checkpoint", str(ckpt),
        "--input-dir", str(root / "data" / "dente"),
        "--output-dir", str(out), "--batch-size", "4", "--num-workers", "2",
        "--num-samples", "6",
    ])
    tifs = sorted(os.listdir(out / "results_tif"))
    pngs = sorted(os.listdir(out / "results_png"))
    assert len(tifs) == 6 and len(pngs) == 6
    side_by_side = read_image(str(out / "results_tif" / tifs[0]))
    assert side_by_side.shape == (32, 64)  # [orig | recon]


def test_evaluate_cli(workspace):
    root, cfg_path, ckpt = workspace
    from pti_ldm_vae_tpu.cli.evaluate_vae import main

    out = root / "eval_out"
    main([
        "-c", str(cfg_path), "--checkpoint", str(ckpt),
        "--input-dir", str(root / "data" / "dente"),
        "--output-dir", str(out), "--batch-size", "4", "--num-workers", "2",
    ])
    payload = json.loads((out / "metrics.json").read_text())
    metrics = payload["metrics"]
    for key in ("recon_loss_mean", "kl_loss_mean", "psnr_mean", "ssim_mean", "mse_mean", "mae_mean"):
        assert key in metrics and np.isfinite(metrics[key])
    assert len(payload["files"]) == 10
    assert payload["perceptual_pretrained"] is False  # no converted weights in CI
    # PSNR/SSIM counted per *valid* sample (10, not 12 padded).
