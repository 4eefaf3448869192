#!/usr/bin/env python
"""Dump reference-model activations for cross-framework parity checking.

Run this in an environment WITH torch + MONAI + the reference package (not
this zero-egress image): it loads the reference ``VAEModel`` from a config
(and optional checkpoint), runs a fixed seeded input through the
deterministic encode/decode path, and writes an ``.npz`` bundle plus the
exact ``state_dict`` used. Feed both to ``tools/check_reference_parity.py``
in THIS framework to measure true end-to-end divergence against the real
MONAI stack (driver bar: recon <= 1e-3).

    python tools/dump_reference_activations.py CONFIG.json [CKPT.pth] out_dir/
"""

from __future__ import annotations

import sys

import numpy as np


def main(config_file: str, checkpoint: str | None, out_dir: str) -> None:
    import os

    import torch
    from monai.bundle import ConfigParser  # type: ignore

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "reference", "src"))
    from pti_ldm_vae.models.autoencoder import VAEModel  # type: ignore

    parser = ConfigParser()
    parser.read_config(config_file)
    parser.parse(True)
    ae_def = parser.get_parsed_content("autoencoder_def")

    model = VAEModel.from_config(ae_def).eval()
    if checkpoint:
        raw = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = raw.get("autoencoder_state_dict", raw)
        model.load_state_dict(sd)

    patch = parser.get_parsed_content("autoencoder_train")["patch_size"]
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=(2, ae_def["in_channels"], *patch)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        z_mu, z_sigma = model.encode(xt)
        recon = model.reconstruct_deterministic(xt)

    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "activations.npz"),
        input=x,
        z_mu=z_mu.numpy(),
        z_sigma=z_sigma.numpy(),
        recon_det=recon.numpy(),
    )
    torch.save(model.state_dict(), os.path.join(out_dir, "state_dict.pth"))
    import json

    with open(os.path.join(out_dir, "autoencoder_def.json"), "w", encoding="utf-8") as fh:
        json.dump(dict(ae_def), fh, indent=2)
    print(f"Wrote activations.npz + state_dict.pth + autoencoder_def.json to {out_dir}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) == 2:
        main(args[0], None, args[1])
    else:
        main(args[0], args[1], args[2])
