"""Analysis stack tests: cache semantics, analyzer encoding, projections,
distances, image-comparison suite."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.analysis import (
    ImageComparison,
    LatentCache,
    LatentSpaceAnalyzer,
    compute_distance_metrics,
    extract_patient_id_from_filename,
    latent_distance,
    latent_distance_cross,
    latent_distance_from_indices,
    load_image_paths,
)
from pti_ldm_vae_tpu.analysis.common import create_transforms, load_and_encode_group_with_cache
from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.models.regressor import flatten_latent

TINY_VAE = dict(
    in_channels=1, out_channels=1, latent_channels=2,
    channels=(8, 16), num_res_blocks=1, norm_num_groups=4,
    attention_levels=(False, False),
    with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
)


@pytest.fixture(scope="module")
def analyzer_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("analysis_ws")
    rng = np.random.default_rng(0)
    imgs = root / "imgs"
    imgs.mkdir()
    for i in range(7):
        img = rng.uniform(0.1, 1.0, size=(20, 24)).astype(np.float32)
        write_tif(str(imgs / f"100{i}_HA_2021_02_{i % 3}.tif"), img)
    model = AutoencoderKL(**TINY_VAE)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    analyzer = LatentSpaceAnalyzer(model, variables, create_transforms((16, 16)), batch_size=4)
    return root, imgs, model, variables, analyzer


def test_patient_id_extraction():
    assert extract_patient_id_from_filename("1000_HA_2021_02_545.tif") == "545"
    assert extract_patient_id_from_filename("plain.tif") == "plain"


def test_encode_images_matches_direct(analyzer_ws):
    root, imgs, model, variables, analyzer = analyzer_ws
    paths = load_image_paths(str(imgs))
    assert len(paths) == 7
    latents, ids = analyzer.encode_images(paths)
    assert latents.shape[0] == 7
    assert ids[0] == "0"
    # Direct single-image encode agrees with the batched/padded program.
    transform = create_transforms((16, 16))
    img = transform(paths[3])[None]
    z = model.apply(variables, jnp.asarray(img), method=model.encode_deterministic)
    expected = np.asarray(flatten_latent(z))[0]
    np.testing.assert_allclose(latents[3], expected, rtol=2e-4, atol=1e-5)


def test_latent_cache_semantics(analyzer_ws, tmp_path):
    root, imgs, model, variables, analyzer = analyzer_ws
    paths = load_image_paths(str(imgs))[:4]
    calls = []

    def encoder_fn(batch_paths):
        calls.append(len(batch_paths))
        return analyzer.encode_images(batch_paths, show_progress=False)

    cache = LatentCache(cache_root=tmp_path / "cache")
    lat1, ids1, _ = cache.get_or_encode_batch(paths, encoder_fn, "weights.ckpt", (16, 16), "g")
    assert calls == [4]
    lat2, ids2, _ = cache.get_or_encode_batch(paths, encoder_fn, "weights.ckpt", (16, 16), "g")
    assert calls == [4]  # all hits, no new encode
    np.testing.assert_array_equal(lat1, lat2)
    assert ids1 == ids2
    # Different model signature -> fresh encode
    cache.get_or_encode_batch(paths, encoder_fn, "other.ckpt", (16, 16), "g")
    assert calls == [4, 4]
    # Touching an image invalidates only that entry
    os.utime(paths[0], (1e9, 1e9))
    cache.get_or_encode_batch(paths, encoder_fn, "weights.ckpt", (16, 16), "g")
    assert calls == [4, 4, 1]
    stats = cache.get_cache_stats()
    assert len(stats) == 2
    cache.clear_cache()
    assert cache.get_cache_stats() == {}


def test_load_and_encode_group_with_cache(analyzer_ws, tmp_path):
    root, imgs, model, variables, analyzer = analyzer_ws
    latents, ids, paths = load_and_encode_group_with_cache(
        analyzer, str(imgs), "w.ckpt", max_images=5, patch_size=(16, 16),
        group_name="edente", cache_dir=tmp_path / "c",
    )
    assert latents.shape[0] == 5 and len(ids) == 5 and len(paths) == 5


def test_tsne_reduction(analyzer_ws):
    root, imgs, model, variables, analyzer = analyzer_ws
    rng = np.random.default_rng(1)
    latents = rng.normal(size=(30, 64)).astype(np.float32)
    reduced = analyzer.reduce_dimensionality_tsne(latents, perplexity=5, pca_components=10)
    assert reduced.shape == (30, 2)
    with pytest.raises(ValueError, match="perplexity"):
        analyzer.reduce_dimensionality_tsne(latents, perplexity=40, pca_components=10)
    with pytest.raises(ValueError, match="PCA"):
        analyzer.reduce_dimensionality_tsne(latents[:5], perplexity=2, pca_components=10)


def test_plot_matplotlib_fallback(analyzer_ws, tmp_path):
    root, imgs, model, variables, analyzer = analyzer_ws
    rng = np.random.default_rng(2)
    proj = rng.normal(size=(6, 2))
    ids = ["1", "2", "3", "1", "2", "3"]
    out = tmp_path / "proj.png"
    analyzer.plot_projection_2d(
        [(proj[:3], ids[:3], "o", "edente"), (proj[3:], ids[3:], "o", "dente")],
        str(out), title="test",
    )
    # plotly absent in this env -> matplotlib png
    assert out.exists() or (tmp_path / "proj.html").exists()


def test_group_statistics(analyzer_ws, tmp_path):
    root, imgs, model, variables, analyzer = analyzer_ws
    rng = np.random.default_rng(3)
    lat1, lat2 = rng.normal(size=(6, 8)), rng.normal(size=(6, 8)) + 3
    proj1, proj2 = rng.normal(size=(6, 2)), rng.normal(size=(6, 2))
    ids = ["a", "a", "b", "b", "c", "c"]
    analyzer.compute_group_statistics(
        [(proj1, ids, "edente"), (proj2, ids, "dente")],
        [(lat1, ids, "edente"), (lat2, ids, "dente")],
        tmp_path,
    )
    text = (tmp_path / "distance_metrics.txt").read_text()
    assert "center_dist" in text
    assert (tmp_path / "exams_sorted_by_distance.txt").exists()


def test_distance_functions():
    a = np.array([0.0, 3.0, 4.0])
    b = np.zeros(3)
    assert latent_distance(a, b) == 5.0
    lat = np.stack([a, b])
    assert latent_distance_from_indices(lat, 0, 1) == 5.0
    assert latent_distance_cross(lat, 0, lat, 1) == 5.0
    with pytest.raises(ValueError):
        latent_distance(a, np.zeros((2, 2)))
    with pytest.raises(ValueError):
        latent_distance_from_indices(lat, 0, 5)


def test_compute_distance_metrics():
    p1 = np.zeros((4, 2))
    p2 = np.ones((4, 2)) * 3
    center, std1, std2, cross = compute_distance_metrics(p1, p2)
    np.testing.assert_allclose(center, np.sqrt(18))
    assert std1 == 0.0 and std2 == 0.0
    np.testing.assert_allclose(cross, np.sqrt(18))
    assert compute_distance_metrics(p1, np.zeros((0, 2))) is None


# ---------------------------------------------------------------- metrics ----
def _synthetic_pair():
    """Elliptical masks (rectangles simplify to 4 contour points and cannot
    be ellipse-fitted, matching a reference limitation)."""
    import cv2

    gt = np.zeros((64, 64), dtype=np.float32)
    cv2.ellipse(gt, (32, 32), (12, 22), 0, 0, 360, 1.0, -1)
    pred = np.zeros((64, 64), dtype=np.float32)
    cv2.ellipse(pred, (32, 32), (10, 20), 0, 0, 360, 0.9, -1)
    return gt, pred


def test_generate_clean_mask():
    comp = ImageComparison()
    gt, pred = _synthetic_pair()
    gt_mask = comp.generate_clean_mask(gt, "gt")
    assert set(np.unique(gt_mask)) <= {0, 255}
    # pred threshold at |x| > 0.2: add small noise below threshold
    noisy = pred.copy()
    noisy[0, 0] = 0.1
    pred_mask = comp.generate_clean_mask(noisy, "pred")
    assert pred_mask[0, 0] == 0
    assert pred_mask[30, 30] == 255


def test_dice_iou_bounds():
    comp = ImageComparison()
    gt, pred = _synthetic_pair()
    dice = comp.dice_coefficient(pred, gt)
    iou = comp.iou(pred, gt)
    assert 0.8 < dice <= 1.0
    assert 0.6 < iou <= 1.0
    perfect = comp.dice_coefficient(gt, gt)
    assert perfect > 0.99


def test_ssim_reimplementation_against_formula():
    from pti_ldm_vae_tpu.analysis.metrics import skimage_ssim

    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, size=(32, 32)).astype(np.float32)
    assert skimage_ssim(a, a, data_range=1.0) == pytest.approx(1.0)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    val = skimage_ssim(a, b, data_range=float(a.max() - a.min()))
    assert 0.0 < val < 1.0


def test_object_dimensions():
    comp = ImageComparison()
    gt, _ = _synthetic_pair()
    binary = comp.generate_clean_mask(gt, "gt")
    h, wu, wm, wl = comp.compute_object_dimensions(binary)
    assert h == 45 and wm == 25  # ellipse radii (12, 22) -> 2r+1


def test_compare_images_full():
    comp = ImageComparison()
    gt, pred = _synthetic_pair()
    metrics = comp.compare_images_and_display_metrics(gt, pred)
    assert set(metrics) >= {
        "MSE", "SSIM", "PSNR", "Dice Coefficient", "IoU",
        "Cosine Similarity", "Height Metric", "Width Metric Middle",
    }
    assert metrics["Height Metric"] == pytest.approx(41 / 45)
    assert comp.worst_metrics["SSIM"][0] == metrics["SSIM"]


def test_process_all_images_end_to_end(tmp_path):
    comp = ImageComparison()
    (tmp_path / "edente").mkdir()
    (tmp_path / "edente_synth").mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        gt, pred = _synthetic_pair()
        gt += rng.normal(scale=0.01, size=gt.shape).astype(np.float32) * (gt > 0)
        write_tif(str(tmp_path / "edente" / f"img_{i}.tif"), gt)
        write_tif(str(tmp_path / "edente_synth" / f"img_{i}.tif"), pred)
    avg, ci = comp.process_all_images([str(tmp_path / "edente")], save_csv=True)
    assert "SSIM" in avg and "Height Metric" in avg
    assert (tmp_path / "edente" / "_metrics.csv").exists()
    assert (tmp_path / "edente" / "_dimensions.csv").exists()
    assert (tmp_path / "edente" / "_metrics_distribution.png").exists()
