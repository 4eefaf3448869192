#!/usr/bin/env python
"""Export torchvision VGG16 (IMAGENET1K_V1) ``features`` weights to the npz
layout consumed by ``analysis/metrics.py`` (ImageComparison feature distance).

Run where torchvision + weights are available; copy the output to
``weights/vgg16_features.npz`` or point ``$PTI_VGG16_WEIGHTS`` at it.

    python tools/convert_vgg16_weights.py weights/vgg16_features.npz
"""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str) -> None:
    from torchvision import models
    from torchvision.models import VGG16_Weights

    features = models.vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features
    out: dict[str, np.ndarray] = {}
    conv_idx = 0
    for mod in features:
        if mod.__class__.__name__ == "Conv2d":
            out[f"conv{conv_idx}/w"] = mod.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"conv{conv_idx}/b"] = mod.bias.detach().numpy()
            conv_idx += 1
    np.savez(out_path, **out)
    print(f"Wrote {conv_idx} conv layers to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/vgg16_features.npz")
