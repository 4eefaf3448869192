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


def test_interactive_slider_recompute_callback(analysis_ws):
    """The live-recompute slider callback body (reference
    ``analyze_interactive.py:559-636``): refits with slider values, returns a
    fresh projection payload; different perplexity -> different projection."""
    import argparse

    from pti_ldm_vae_tpu.cli.analyze_interactive import (
        _compute_groups,
        recompute_projection,
        slider_recompute_payload,
    )

    args = argparse.Namespace(
        vae_weights=str(analysis_ws / "vae_ckpt"),
        config_file=str(analysis_ws / "config.json"),
        folder_edente=str(analysis_ws / "edente"),
        folder_dente=None,
        max_images=55, patch_size=[16, 16], seed=42,
        output_dir=str(analysis_ws / "slider_out"),
        cache_dir=str(analysis_ws / "cache"),
    )
    analyzer, _, groups = _compute_groups(args)
    groups = recompute_projection(analyzer, groups, "tsne", perplexity=8, seed=42)
    base = np.asarray(groups[0]["projection"]).copy()
    assert base.shape == (55, 2)

    payload = slider_recompute_payload(analyzer, groups, "tsne", perplexity=20, seed=42)
    assert payload["method"] == "tsne" and payload["hyper"]["perplexity"] == 20
    new = np.asarray(payload["groups"][0]["projection"])
    assert new.shape == base.shape
    assert not np.allclose(new, base)  # the slider actually refit


def test_umap_model_transform_accepts_raw_latents(analysis_ws, monkeypatch):
    """reduce_dimensionality_umap must return a model whose .transform takes
    RAW latents (PCA composed in) — the reference aligns the dente group that
    way. A strict fake UMAP asserts it only ever sees PCA-50 vectors."""
    from pti_ldm_vae_tpu.analysis import latent_space as ls

    class FakeUMAP:
        def __init__(self, n_components=2, random_state=42, n_neighbors=40, min_dist=0.5):
            self.n_components = n_components

        def fit_transform(self, v):
            assert v.shape[1] == 50, f"UMAP must see PCA-50 vectors, got {v.shape}"
            self._dim = v.shape[1]
            return v[:, :2]

        def transform(self, v):
            assert v.shape[1] == self._dim, f"transform got raw latents: {v.shape}"
            return v[:, :2]

    monkeypatch.setattr(ls, "_umap", type("M", (), {"UMAP": FakeUMAP}))
    rng = np.random.default_rng(0)
    analyzer = ls.LatentSpaceAnalyzer.__new__(ls.LatentSpaceAnalyzer)
    latents_a = rng.normal(size=(60, 128)).astype(np.float32)
    latents_b = rng.normal(size=(20, 128)).astype(np.float32)
    emb, model = ls.LatentSpaceAnalyzer.reduce_dimensionality_umap(
        analyzer, latents_a, pca_components=50
    )
    assert emb.shape == (60, 2)
    aligned = model.transform(latents_b)  # raw 128-dim in, composed PCA inside
    assert aligned.shape == (20, 2)


def test_ar_channel_dropdown_callback(analysis_ws):
    """Channel-dropdown callback body (reference ``analyze_ar_channels.py:
    272-299``): valid channel -> normalized heatmap + AR label; out-of-range
    and None -> explicit invalid payloads."""
    from pti_ldm_vae_tpu.cli.analyze_ar_channels import select_channel_payload

    latents = np.stack([np.full((4, 4), 2.0), np.arange(16, dtype=np.float32).reshape(4, 4)])
    mapping = {"height_0": 0}

    reg = select_channel_payload(latents, mapping, 0)
    assert reg["valid"] and reg["title"] == "ch 0: height_0 (regularized)"
    assert np.all(reg["data"] == 0)  # constant map normalizes to zeros

    unmapped = select_channel_payload(latents, mapping, 1)
    assert unmapped["valid"] and unmapped["title"] == "ch 1: unmapped"
    assert unmapped["data"].min() == 0.0 and unmapped["data"].max() == 1.0

    oob = select_channel_payload(latents, mapping, 7)
    assert not oob["valid"] and "out of range" in oob["title"]
    neg = select_channel_payload(latents, mapping, -1)
    assert not neg["valid"] and "out of range" in neg["title"]
    none = select_channel_payload(latents, mapping, None)
    assert not none["valid"] and none["title"] == "No channel"
