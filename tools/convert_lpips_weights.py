#!/usr/bin/env python
"""Export pretrained LPIPS(squeeze) weights to the npz layout this framework
loads (``models/lpips.py:load_lpips_params``).

``convert_state_dicts`` is pure numpy and is covered by
``tests/test_weight_converters.py`` end-to-end (torch-format state dicts ->
npz -> ``load_lpips_params`` -> distance parity vs a torch mirror carrying
the same weights). ``main`` additionally needs the ``lpips`` package — run it
in ANY environment where it is installed (not this zero-egress image) and
copy the output to ``weights/lpips_squeeze.npz`` or point
``$PTI_LPIPS_WEIGHTS`` at it:

    python tools/convert_lpips_weights.py weights/lpips_squeeze.npz
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision squeezenet1_1 `features` indices of the Fire modules
# (0=conv, 1=relu, 2/5/8=maxpool; see docs/MONAI_NOTES.md §5 / models/lpips.py).
FIRE_INDICES = (3, 4, 6, 7, 9, 10, 11, 12)


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_state_dicts(features_sd: dict, lins_sd: dict) -> dict[str, np.ndarray]:
    """(torchvision squeezenet1_1 ``features`` state dict, lpips lin-head
    state dict) -> flat ``{key: array}`` npz mapping.

    ``features_sd`` keys: ``"0.weight"``, ``"3.squeeze.weight"``,
    ``"3.expand1x1.bias"``, … (torch OIHW). ``lins_sd`` accepts the lpips
    package's ``lin{i}.model.1.weight`` keys, the ``lins.{i}.model.1.weight``
    ModuleList aliases, or bare ``{i}.model.1.weight`` — each a non-negative
    [1, C, 1, 1] conv kernel stored here as a flat [C] vector.
    """
    out: dict[str, np.ndarray] = {}

    def conv(prefix: str, torch_key: str) -> None:
        out[f"{prefix}/w"] = _to_np(features_sd[f"{torch_key}.weight"]).transpose(2, 3, 1, 0)
        out[f"{prefix}/b"] = _to_np(features_sd[f"{torch_key}.bias"])

    conv("conv0", "0")
    for i, idx in enumerate(FIRE_INDICES):
        conv(f"fire{i}/squeeze", f"{idx}.squeeze")
        conv(f"fire{i}/expand1", f"{idx}.expand1x1")
        conv(f"fire{i}/expand3", f"{idx}.expand3x3")

    for i in range(7):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight", f"{i}.model.1.weight"):
            if key in lins_sd:
                out[f"lin{i}/w"] = _to_np(lins_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"no lin weight for tap {i} in {sorted(lins_sd)[:4]}")
    return out


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="squeeze", verbose=False)
    trunk = net.net  # squeezenet slices (module names preserve torchvision indices)
    features = torch.nn.Sequential()
    for slice_mod in (trunk.slice1, trunk.slice2, trunk.slice3, trunk.slice4,
                      trunk.slice5, trunk.slice6, trunk.slice7):
        for name, mod in slice_mod.named_children():
            features.add_module(name, mod)
    lins_sd = {f"lin{i}.model.1.weight": lin.model[-1].weight for i, lin in enumerate(net.lins)}
    out = convert_state_dicts(features.state_dict(), lins_sd)
    np.savez(out_path, **out)
    print(f"Wrote {len(out)} arrays to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/lpips_squeeze.npz")
