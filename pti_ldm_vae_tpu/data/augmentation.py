"""Paired image augmentation (reference ``src/pti_ldm_vae/data/augmentation.py``).

The reference builds an albumentations pipeline (HFlip / VFlip / Rot90 /
ShiftScaleRotate / ElasticTransform with a paired ``condition_image`` target)
that the training path never uses (SURVEY.md §2.1 #7). Provided here with the
same knobs: when ``albumentations`` is installed the original pipeline is
returned; otherwise a numpy/cv2 implementation with identical transform
semantics (same probabilities and parameter ranges) is used, applying the
SAME sampled transform to image and condition image.
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_albumentations_transform", "PairedAugmentation"]

try:  # optional dependency, matches the reference when present
    import albumentations as _albu
except ImportError:  # pragma: no cover
    _albu = None

import cv2


def get_albumentations_transform(prob: float = 0.5):
    """HFlip/VFlip/Rot90/ShiftScaleRotate/Elastic pipeline with paired target.

    Returns an albumentations ``Compose`` when the package exists (reference
    behavior), else a :class:`PairedAugmentation` with the same call contract
    (``transform(image=..., condition_image=...) -> dict``).
    """
    if _albu is not None:  # pragma: no cover - not shipped in this env
        return _albu.Compose(
            [
                _albu.HorizontalFlip(p=prob),
                _albu.VerticalFlip(p=prob),
                _albu.RandomRotate90(p=prob),
                _albu.ShiftScaleRotate(
                    shift_limit=0.0625, scale_limit=0.1, rotate_limit=15, p=prob
                ),
                _albu.ElasticTransform(alpha=1, sigma=50, p=prob),
            ],
            additional_targets={"condition_image": "image"},
        )
    return PairedAugmentation(prob=prob)


class PairedAugmentation:
    """Numpy/cv2 fallback with albumentations-compatible call contract."""

    def __init__(self, prob: float = 0.5, seed: int | None = None):
        self.prob = prob
        self.rng = np.random.default_rng(seed)

    def _shift_scale_rotate(self, img, shift, scale, angle):
        h, w = img.shape[:2]
        mat = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        mat[0, 2] += shift[0] * w
        mat[1, 2] += shift[1] * h
        return cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REFLECT_101)

    def _elastic(self, img, alpha, sigma, seed):
        h, w = img.shape[:2]
        local = np.random.default_rng(seed)
        dx = cv2.GaussianBlur((local.random((h, w)).astype(np.float32) * 2 - 1),
                              (0, 0), sigma) * alpha
        dy = cv2.GaussianBlur((local.random((h, w)).astype(np.float32) * 2 - 1),
                              (0, 0), sigma) * alpha
        xx, yy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
        return cv2.remap(img, xx + dx, yy + dy, interpolation=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT_101)

    def __call__(self, *, image: np.ndarray, condition_image: np.ndarray | None = None, **_):
        imgs = {"image": np.asarray(image, dtype=np.float32)}
        if condition_image is not None:
            imgs["condition_image"] = np.asarray(condition_image, dtype=np.float32)

        # Sample one transform decision set; apply identically to both images.
        decisions = {
            "hflip": self.rng.random() < self.prob,
            "vflip": self.rng.random() < self.prob,
            "rot90": int(self.rng.integers(0, 4)) if self.rng.random() < self.prob else 0,
            "ssr": self.rng.random() < self.prob,
            "elastic": self.rng.random() < self.prob,
        }
        shift = self.rng.uniform(-0.0625, 0.0625, size=2)
        scale = 1.0 + self.rng.uniform(-0.1, 0.1)
        angle = self.rng.uniform(-15, 15)
        elastic_seed = int(self.rng.integers(0, 2**31))

        for key, img in imgs.items():
            if decisions["hflip"]:
                img = img[:, ::-1]
            if decisions["vflip"]:
                img = img[::-1, :]
            if decisions["rot90"]:
                img = np.rot90(img, k=decisions["rot90"])
            img = np.ascontiguousarray(img)
            if decisions["ssr"]:
                img = self._shift_scale_rotate(img, shift, scale, angle)
            if decisions["elastic"]:
                img = self._elastic(img, alpha=1.0, sigma=50.0, seed=elastic_seed)
            imgs[key] = img
        return imgs
