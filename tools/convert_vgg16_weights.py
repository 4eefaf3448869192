#!/usr/bin/env python
"""Export torchvision VGG16 (IMAGENET1K_V1) ``features`` weights to the npz
layout consumed by ``analysis/metrics.py`` (ImageComparison feature distance).

``convert_features_state_dict`` is pure numpy and covered by
``tests/test_weight_converters.py``. ``main`` needs torchvision + the
pretrained weights — run it where they are available and copy the output to
``weights/vgg16_features.npz`` or point ``$PTI_VGG16_WEIGHTS`` at it:

    python tools/convert_vgg16_weights.py weights/vgg16_features.npz
"""

from __future__ import annotations

import sys

import numpy as np

# Conv2d indices inside torchvision vgg16().features (cfg "D").
VGG16_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_features_state_dict(features_sd: dict) -> dict[str, np.ndarray]:
    """torchvision ``vgg16().features`` state dict (keys ``{idx}.weight``,
    OIHW) -> flat ``{"conv{i}/w|b": array}`` npz mapping (HWIO)."""
    out: dict[str, np.ndarray] = {}
    for i, idx in enumerate(VGG16_CONV_INDICES):
        out[f"conv{i}/w"] = _to_np(features_sd[f"{idx}.weight"]).transpose(2, 3, 1, 0)
        out[f"conv{i}/b"] = _to_np(features_sd[f"{idx}.bias"])
    return out


def main(out_path: str) -> None:
    from torchvision import models
    from torchvision.models import VGG16_Weights

    features = models.vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features
    out = convert_features_state_dict(features.state_dict())
    np.savez(out_path, **out)
    print(f"Wrote {len(out) // 2} conv layers to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/vgg16_features.npz")
