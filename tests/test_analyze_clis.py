"""End-to-end tests for the analysis CLIs (static export paths)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL


@pytest.fixture(scope="module")
def analysis_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("acli_ws")
    rng = np.random.default_rng(0)
    for sub in ("edente", "dente"):
        (root / sub).mkdir()
        for i in range(60):
            img = rng.uniform(0.1, 1.0, size=(16, 16)).astype(np.float32)
            write_tif(str(root / sub / f"20{i:02d}_HA_2021_02_{i % 6}.tif"), img)

    arch = dict(
        spatial_dims=2, in_channels=1, out_channels=1, latent_channels=2,
        channels=[8, 16], num_res_blocks=1, norm_num_groups=4, norm_eps=1e-6,
        attention_levels=[False, False],
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
    )
    model = AutoencoderKL(**{**arch, "channels": (8, 16), "attention_levels": (False, False)})
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    save_pytree(str(root / "vae_ckpt"), variables)
    cfg = {
        "autoencoder_def": arch,
        "autoencoder_train": {"patch_size": [16, 16]},
        "regularized_attributes": {
            "enabled": True,
            "attribute_latent_mapping": {
                "_c": "comment",
                "height_0": {"latent_channel": 0, "delta": 1.0},
            },
        },
    }
    (root / "config.json").write_text(json.dumps(cfg))
    return root


def test_analyze_static_tsne(analysis_ws):
    from pti_ldm_vae_tpu.cli.analyze_static import main

    out = analysis_ws / "proj_static"
    main([
        "--vae-weights", str(analysis_ws / "vae_ckpt"),
        "--config-file", str(analysis_ws / "config.json"),
        "--folder-edente", str(analysis_ws / "edente"),
        "--folder-dente", str(analysis_ws / "dente"),
        "--output-dir", str(out),
        "--method", "tsne", "--perplexity", "10",
        "--max-images", "60", "--patch-size", "16", "16",
        "--color-by-patient",
        "--cache-dir", str(analysis_ws / "cache"),
    ])
    files = {p.name for p in out.iterdir()}
    assert "tsne_projection.png" in files or "tsne_projection.html" in files
    assert "color_legend.txt" in files
    assert "distance_metrics.txt" in files
    assert "exams_sorted_by_distance.txt" in files


def test_analyze_interactive_export(analysis_ws):
    from pti_ldm_vae_tpu.cli.analyze_interactive import main

    out = analysis_ws / "proj_interactive"
    data_path = main([
        "--vae-weights", str(analysis_ws / "vae_ckpt"),
        "--config-file", str(analysis_ws / "config.json"),
        "--folder-edente", str(analysis_ws / "edente"),
        "--max-images", "55", "--patch-size", "16", "16",
        "--method", "tsne", "--perplexity", "8",
        "--output-dir", str(out), "--export",
        "--cache-dir", str(analysis_ws / "cache2"),
    ])
    payload = json.loads(data_path.read_text())
    assert payload["method"] == "tsne"
    assert len(payload["groups"][0]["projection"]) == 55


def test_analyze_ar_channels_export(analysis_ws):
    from pti_ldm_vae_tpu.cli.analyze_ar_channels import main

    img = next((analysis_ws / "edente").glob("*.tif"))
    out = analysis_ws / "ar_channels.png"
    result = main([
        "-c", str(analysis_ws / "config.json"),
        "--checkpoint", str(analysis_ws / "vae_ckpt"),
        "--image-path", str(img),
        "--export", "--output", str(out),
    ])
    assert out.exists()
