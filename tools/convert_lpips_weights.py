#!/usr/bin/env python
"""Export pretrained LPIPS(squeeze) weights to the npz layout this framework
loads (``models/lpips.py:load_lpips_params``).

Run in ANY environment with the ``lpips`` package installed (not this
zero-egress image) and copy the output to ``weights/lpips_squeeze.npz`` or
point ``$PTI_LPIPS_WEIGHTS`` at it.

    python tools/convert_lpips_weights.py weights/lpips_squeeze.npz
"""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="squeeze", verbose=False)
    trunk = net.net  # squeezenet slices
    out: dict[str, np.ndarray] = {}

    def conv(prefix: str, module) -> None:
        out[f"{prefix}/w"] = module.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"{prefix}/b"] = module.bias.detach().numpy()

    # torchvision squeezenet1_1 features indices (see models/lpips.py layout)
    features = torch.nn.Sequential(
        *trunk.slice1, *trunk.slice2, *trunk.slice3, *trunk.slice4,
        *trunk.slice5, *trunk.slice6, *trunk.slice7,
    )
    conv("conv0", features[0])
    fire_idx = 0
    for mod in features:
        if mod.__class__.__name__ == "Fire":
            conv(f"fire{fire_idx}/squeeze", mod.squeeze)
            conv(f"fire{fire_idx}/expand1", mod.expand1x1)
            conv(f"fire{fire_idx}/expand3", mod.expand3x3)
            fire_idx += 1
    for i, lin in enumerate(net.lins):
        out[f"lin{i}/w"] = lin.model[-1].weight.detach().numpy().reshape(-1)

    np.savez(out_path, **out)
    print(f"Wrote {len(out)} arrays to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/lpips_squeeze.npz")
