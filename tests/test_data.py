"""Data pipeline tests: IO round-trip, transform parity, split parity, loader."""

import json
import random

import numpy as np
import pytest

from pti_ldm_vae_tpu.data import (
    ShardedDataLoader,
    attributes_for_paths,
    create_vae_dataloaders,
    list_tif_paths,
    local_normalize_by_mask,
    local_normalize_by_mask_np,
    preprocess_image_np,
    read_image,
    shard_indices,
    split_dataset,
    write_tif,
)


@pytest.fixture(scope="module")
def tif_dir(tmp_path_factory):
    """Synthetic dataset: dente/edente subfolders of small float TIFs."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for src in ("edente", "dente"):
        (root / src).mkdir()
        for i in range(12):
            img = rng.uniform(0, 1, size=(40, 60)).astype(np.float32)
            img[:5, :] = 0.0  # background region
            write_tif(str(root / src / f"{src}_{i:03d}.tif"), img)
    return root


def test_tif_roundtrip(tmp_path):
    img = np.random.default_rng(1).normal(size=(17, 23)).astype(np.float32)
    path = str(tmp_path / "x.tif")
    write_tif(path, img)
    back = read_image(path)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_list_tif_paths(tif_dir):
    edente = list_tif_paths(str(tif_dir), "edente")
    dente = list_tif_paths(str(tif_dir), "dente")
    both = list_tif_paths(str(tif_dir), "both")
    assert len(edente) == len(dente) == 12
    assert both == edente + dente
    assert edente == sorted(edente)
    with pytest.raises(ValueError):
        list_tif_paths(str(tif_dir), "bogus")


def test_local_normalize_by_mask_reference_semantics():
    img = np.zeros((8, 8), dtype=np.float32)
    img[2:6, 2:6] = np.arange(16, dtype=np.float32).reshape(4, 4) + 1
    out = local_normalize_by_mask_np(img)
    # Background stays exactly zero.
    assert np.all(out[img == 0] == 0.0)
    pix = img[img != 0]
    expected = (pix - pix.mean()) / pix.std()
    np.testing.assert_allclose(out[img != 0], expected, rtol=1e-6)
    # Constant foreground -> std floor 1.0.
    flat = np.zeros((4, 4), dtype=np.float32)
    flat[1:3, 1:3] = 5.0
    out_flat = local_normalize_by_mask_np(flat)
    np.testing.assert_allclose(out_flat[flat != 0], 0.0, atol=1e-6)


def test_local_normalize_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 2, size=(16, 16, 1)).astype(np.float32)
    img[img < 0.4] = 0.0
    host = local_normalize_by_mask_np(img)
    dev = np.asarray(local_normalize_by_mask(jnp.asarray(img)))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
    # Batched variant computes per-image stats.
    batch = np.stack([img, img * 2.0])
    dev_b = np.asarray(local_normalize_by_mask(jnp.asarray(batch)))
    np.testing.assert_allclose(dev_b[0], host, rtol=1e-4, atol=1e-5)


def test_split_matches_reference_shuffle():
    """The reference shuffles via random.seed(s); random.shuffle(paths.copy())
    then splits at int(0.9*n) (dataloaders.py:469-513). Reproduce inline."""
    paths = [f"img_{i:03d}.tif" for i in range(50)]
    train, val, _, _ = split_dataset(paths, train_split=0.9, seed=42)

    expected = paths.copy()
    random.seed(42)
    random.shuffle(expected)
    assert train == expected[:45]
    assert val == expected[45:]

    # Attributes stay aligned through the paired shuffle.
    attrs = [{"a": float(i)} for i in range(50)]
    train2, val2, ta, va = split_dataset(paths, train_split=0.9, seed=42, attributes=attrs)
    assert train2 == train and val2 == val
    for p, a in zip(train2, ta):
        assert int(p.split("_")[1].split(".")[0]) == int(a["a"])


def test_split_no_seed_no_shuffle():
    paths = [f"{i}.tif" for i in range(10)]
    train, val, _, _ = split_dataset(paths, train_split=0.9, seed=None)
    assert train == paths[:9] and val == paths[9:]


def test_shard_indices_distributed_sampler_semantics():
    # 10 items over 4 ranks -> padded to 12 by wrapping, 3 each, disjoint-ish.
    shards = [shard_indices(10, rank=r, world=4) for r in range(4)]
    assert all(len(s) == 3 for s in shards)
    flat = np.concatenate(shards)
    assert set(flat[:10]) | set(flat) == set(range(10))
    # Same seed+epoch -> same schedule across ranks.
    a = shard_indices(10, rank=1, world=4, shuffle=True, seed=7, epoch=3)
    b = shard_indices(10, rank=1, world=4, shuffle=True, seed=7, epoch=3)
    np.testing.assert_array_equal(a, b)
    c = shard_indices(10, rank=1, world=4, shuffle=True, seed=7, epoch=4)
    assert not np.array_equal(a, c)


def test_attributes_for_paths(tif_dir):
    paths = list_tif_paths(str(tif_dir), "edente")
    attr_json = {
        f"edente_{i:03d}.tif": {"height_0": float(i), "width_0": 2.0 * i} for i in range(12)
    }
    attr_file = tif_dir / "attributes_edente.json"
    attr_file.write_text(json.dumps(attr_json))
    from pti_ldm_vae_tpu.data import select_attribute_sources

    sources = select_attribute_sources(str(attr_file), "edente")
    mapping = {"height_0": {"latent_channel": 0}, "width_0": {"latent_channel": 1}, "_c": {}}
    attrs = attributes_for_paths(paths, sources, mapping)
    assert attrs[3] == {"height_0": 3.0, "width_0": 6.0}
    with pytest.raises(KeyError):
        attributes_for_paths(paths, sources, {"missing_attr": {}})


def test_loader_batches_static_shapes(tif_dir):
    paths = list_tif_paths(str(tif_dir), "edente")  # 12 images
    loader = ShardedDataLoader(paths, (32, 32), batch_size=5, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (5, 32, 32, 1)
        assert b["mask"].shape == (5,)
    assert batches[0]["mask"].sum() == 5
    assert batches[2]["mask"].sum() == 2  # 12 = 5+5+2, padded
    assert np.all(batches[2]["image"][2:] == 0)


def test_loader_preprocessing_matches_direct(tif_dir):
    paths = list_tif_paths(str(tif_dir), "dente")[:2]
    loader = ShardedDataLoader(paths, (24, 24), batch_size=2, num_workers=1)
    batch = next(iter(loader))
    direct = preprocess_image_np(read_image(paths[0]), (24, 24))
    # The loader may take the native C++ path (f64 accumulators) — identical
    # to the numpy path up to f32 summation order.
    np.testing.assert_allclose(batch["image"][0], direct, rtol=1e-5, atol=1e-6)


def test_loader_cache(tif_dir):
    paths = list_tif_paths(str(tif_dir), "edente")
    loader = ShardedDataLoader(paths, (16, 16), batch_size=4, cache_rate=1.0, num_workers=2)
    list(loader)
    assert len(loader._cache) == 12
    first = next(iter(loader))
    assert first["image"].shape == (4, 16, 16, 1)


def test_create_vae_dataloaders_end_to_end(tif_dir):
    train_loader, val_loader, train_paths, val_paths = create_vae_dataloaders(
        str(tif_dir), batch_size=4, patch_size=(16, 16),
        data_source="both", train_split=0.9, seed=42, num_workers=2,
    )
    assert len(train_paths) == 21 and len(val_paths) == 3  # int(0.9*24)=21
    batch = next(iter(val_loader))
    assert batch["image"].shape == (4, 16, 16, 1)
    assert batch["mask"].sum() == 3


def test_create_vae_dataloaders_with_attributes(tif_dir):
    attr = {f"edente_{i:03d}.tif": {"height_0": float(i)} for i in range(12)}
    attr_file = tif_dir / "attr2.json"
    attr_file.write_text(json.dumps(attr))
    cfg = {
        "attribute_file": str(attr_file),
        "attribute_latent_mapping": {"height_0": {"latent_channel": 0, "delta": 1.0}},
    }
    train_loader, val_loader, *_ = create_vae_dataloaders(
        str(tif_dir), batch_size=3, patch_size=(16, 16),
        data_source="edente", seed=42, ar_vae_enabled=True,
        regularized_attributes=cfg, num_workers=2,
    )
    batch = next(iter(train_loader))
    assert "attributes" in batch
    assert batch["attributes"]["height_0"].shape == (3,)
