"""Native C++ data path: decode/resize/normalize parity with the Python path."""

import numpy as np
import pytest

from pti_ldm_vae_tpu import native
from pti_ldm_vae_tpu.data.io import read_image, write_tif
from pti_ldm_vae_tpu.data.loader import ShardedDataLoader
from pti_ldm_vae_tpu.data.transforms import preprocess_image_np


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_decode_matches_python(built, tmp_path):
    img = np.random.default_rng(0).normal(size=(33, 47)).astype(np.float32)
    path = str(tmp_path / "x.tif")
    write_tif(path, img)
    native_img = native.decode_tiff(path)
    assert native_img is not None
    np.testing.assert_array_equal(native_img, read_image(path))
    np.testing.assert_array_equal(native_img, img)


def test_native_preprocess_matches_python(built, tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 2, size=(50, 70)).astype(np.float32)
    img[img < 0.5] = 0.0  # background
    path = str(tmp_path / "y.tif")
    write_tif(path, img)
    native_out = native.preprocess_tiff(path, (32, 32))
    assert native_out is not None and native_out.shape == (32, 32, 1)
    python_out = preprocess_image_np(read_image(path), (32, 32))
    np.testing.assert_allclose(native_out, python_out, rtol=1e-5, atol=1e-6)


def test_native_identity_resize(built, tmp_path):
    img = np.random.default_rng(2).uniform(0.1, 1.0, size=(16, 16)).astype(np.float32)
    path = str(tmp_path / "z.tif")
    write_tif(path, img)
    native_out = native.preprocess_tiff(path, (16, 16))
    python_out = preprocess_image_np(read_image(path), (16, 16))
    # f64-accumulator stats vs numpy pairwise-sum: identical to ~1e-6.
    np.testing.assert_allclose(native_out, python_out, rtol=1e-5, atol=1e-6)


def test_loader_uses_native_path(built, tmp_path):
    rng = np.random.default_rng(3)
    for i in range(4):
        write_tif(str(tmp_path / f"img_{i}.tif"),
                  rng.uniform(0.1, 1.0, size=(24, 24)).astype(np.float32))
    paths = sorted(str(p) for p in tmp_path.glob("*.tif"))
    loader = ShardedDataLoader(paths, (16, 16), batch_size=4, num_workers=2)
    batch = next(iter(loader))
    expected = preprocess_image_np(read_image(paths[0]), (16, 16))
    np.testing.assert_allclose(batch["image"][0], expected, rtol=1e-5, atol=1e-6)


def test_unsupported_tiff_falls_back(built, tmp_path):
    # PNG path: not a TIFF -> probe fails in the loader branch, Python reads it.
    from pti_ldm_vae_tpu.data.io import write_png

    img = (np.random.default_rng(4).uniform(0, 255, size=(20, 20))).astype(np.uint8)
    path = str(tmp_path / "img.png")
    write_png(path, img)
    assert native.preprocess_tiff(path, (16, 16)) is None
    out = preprocess_image_np(read_image(path), (16, 16))
    assert out.shape == (16, 16, 1)
