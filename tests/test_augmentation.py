"""Paired augmentation tests (numpy/cv2 fallback path)."""

import numpy as np

from pti_ldm_vae_tpu.data.augmentation import PairedAugmentation, get_albumentations_transform


def test_factory_returns_callable():
    t = get_albumentations_transform(prob=0.5)
    assert callable(t)


def test_identity_at_zero_prob():
    aug = PairedAugmentation(prob=0.0, seed=0)
    img = np.random.default_rng(0).uniform(size=(16, 16)).astype(np.float32)
    out = aug(image=img)
    np.testing.assert_array_equal(out["image"], img)


def test_paired_transform_applies_identically():
    aug = PairedAugmentation(prob=1.0, seed=3)
    img = np.random.default_rng(1).uniform(size=(32, 32)).astype(np.float32)
    out = aug(image=img, condition_image=img.copy())
    # Same transform on identical inputs -> identical outputs.
    np.testing.assert_array_equal(out["image"], out["condition_image"])
    # And the transform actually did something.
    assert not np.array_equal(out["image"], img)


def test_shapes_preserved_square():
    # rot90 legitimately swaps H/W for non-square inputs (albumentations
    # RandomRotate90 does the same), so shape preservation holds for squares.
    aug = PairedAugmentation(prob=1.0, seed=7)
    img = np.random.default_rng(2).uniform(size=(32, 32)).astype(np.float32)
    out = aug(image=img)
    assert out["image"].shape == img.shape
    assert np.isfinite(out["image"]).all()
