"""End-to-end LDM CLIs: train_diffusion -> sample_diffusion -> run_pti."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL

# fast tier excludes this module (full diffusion CLI runs (compile-heavy))
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ldm_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("ldm_ws")
    data = root / "imgs"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.uniform(0.1, 1.0, size=(16, 16)).astype(np.float32)
        write_tif(str(data / f"img_{i:02d}.tif"), img)

    vae_arch = dict(
        spatial_dims=2, in_channels=1, out_channels=1, latent_channels=2,
        channels=[8, 16], num_res_blocks=1, norm_num_groups=4, norm_eps=1e-6,
        attention_levels=[False, False],
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
    )
    model = AutoencoderKL(**{**vae_arch, "channels": (8, 16),
                             "attention_levels": (False, False)})
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    save_pytree(str(root / "vae_ckpt"), variables)
    (root / "vae_config.json").write_text(json.dumps({
        "autoencoder_def": vae_arch,
        "autoencoder_train": {"patch_size": [16, 16]},
    }))
    (root / "ldm_config.json").write_text(json.dumps({
        "run_dir": str(root / "runs" / "ldm"),
        "vae": {"config_file": str(root / "vae_config.json"),
                "checkpoint": str(root / "vae_ckpt")},
        "diffusion_def": {
            "spatial_dims": 2, "in_channels": 2, "out_channels": 2,
            "channels": [8, 16], "attention_levels": [False, True],
            "num_head_channels": [0, 8], "num_res_blocks": 1,
            "with_conditioning": True, "cross_attention_dim": 16,
            "norm_num_groups": 4,
        },
        "diffusion_train": {"batch_size": 3, "lr": 1e-4, "max_epochs": 1,
                             "num_train_timesteps": 50},
        "sampling": {"num_inference_steps": 5, "eta": 0.0},
        "wandb": {"enabled": False},
    }))
    return root


def test_train_diffusion_cli(ldm_ws):
    from pti_ldm_vae_tpu.cli.train_diffusion import main

    result = main([
        "-c", str(ldm_ws / "ldm_config.json"),
        "--input-dir", str(ldm_ws / "imgs"),
        "--num-workers", "2",
    ])
    assert np.isfinite(result["final_loss"])
    assert (ldm_ws / "runs" / "ldm" / "trained_weights" / "diffusion_last").exists()


def test_sample_diffusion_cli(ldm_ws):
    from pti_ldm_vae_tpu.cli.sample_diffusion import main

    out = main([
        "-c", str(ldm_ws / "ldm_config.json"),
        "--checkpoint", str(ldm_ws / "runs" / "ldm" / "trained_weights" / "diffusion_last"),
        "--output-dir", str(ldm_ws / "samples"),
        "--num-images", "2",
        "--condition-dir", str(ldm_ws / "imgs"),
        "--num-inference-steps", "4",
    ])
    tifs = sorted(p.name for p in out.glob("*.tif"))
    assert len(tifs) == 2


def test_run_pti_cli(ldm_ws):
    from pti_ldm_vae_tpu.cli.run_pti import main

    out = main([
        "-c", str(ldm_ws / "vae_config.json"),
        "--checkpoint", str(ldm_ws / "vae_ckpt"),
        "--input-dir", str(ldm_ws / "imgs"),
        "--output-dir", str(ldm_ws / "pti"),
        "--num-samples", "1",
        "--latent-steps", "20", "--tune-steps", "10",
    ])
    pivots = list(out.glob("*_pivot.npz"))
    assert len(pivots) == 1
    data = np.load(pivots[0])
    # Inversion reduced the reconstruction loss.
    assert data["latent_loss"][-1] <= data["latent_loss"][0]
    assert data["tune_loss"][-1] <= data["tune_loss"][0]
    assert len(list(out.glob("*_pti.tif"))) == 1
