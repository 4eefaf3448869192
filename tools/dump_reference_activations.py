#!/usr/bin/env python
"""Dump reference-model activations for cross-framework parity checking.

Run this in an environment WITH torch + MONAI + the reference package (not
this zero-egress image): it loads the reference models from a config (and
optional checkpoint), runs fixed seeded inputs through them, and writes
``.npz`` bundles plus the exact ``state_dict`` used. Feed the output to
``tools/check_reference_parity.py`` (or the aggregating
``tools/run_full_parity.py jax-side``) in THIS framework to measure true
end-to-end divergence against the real MONAI stack (driver bar: recon <=
1e-3).

    python tools/dump_reference_activations.py CONFIG.json [CKPT.pth] out_dir/
    python tools/dump_reference_activations.py CONFIG.json out_dir/ --discriminator
    python tools/dump_reference_activations.py LDM_CONFIG.json out_dir/ --unet

The VAE dump goes to ``out_dir`` (activations.npz + state_dict.pth +
autoencoder_def.json); ``--discriminator`` adds ``out_dir/disc/``;
``--unet`` treats CONFIG as an LDM config (``diffusion_def`` block) and
writes ``out_dir/unet/`` instead of a VAE dump.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _reference_src() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "reference", "src")


def dump_vae(config_file: str, checkpoint: str | None, out_dir: str) -> None:
    import torch
    from monai.bundle import ConfigParser  # type: ignore

    sys.path.insert(0, _reference_src())
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
    with open(os.path.join(out_dir, "autoencoder_def.json"), "w", encoding="utf-8") as fh:
        json.dump(dict(ae_def), fh, indent=2)
    print(f"Wrote VAE activations.npz + state_dict.pth + autoencoder_def.json to {out_dir}")


def dump_discriminator(config_file: str, checkpoint: str | None, out_dir: str) -> None:
    """PatchDiscriminator at the reference's exact training construction
    (``vae_scripts/train_vae.py:268-275``): num_layers_d=3, channels=32."""
    import torch
    from monai.networks.nets import PatchDiscriminator  # type: ignore

    disc_dir = os.path.join(out_dir, "disc")
    os.makedirs(disc_dir, exist_ok=True)
    with open(config_file, encoding="utf-8") as fh:
        cfg = json.load(fh)
    spatial_dims = int(cfg.get("spatial_dims", 2))
    patch = cfg["autoencoder_train"]["patch_size"]

    torch.manual_seed(0)
    disc = PatchDiscriminator(
        spatial_dims=spatial_dims, num_layers_d=3, channels=32,
        in_channels=1, out_channels=1,
    ).eval()
    if checkpoint:
        raw = torch.load(checkpoint, map_location="cpu", weights_only=False)
        sd = raw.get("discriminator_state_dict", raw)
        disc.load_state_dict(sd)

    rng = np.random.default_rng(1)
    x = rng.uniform(0.0, 1.0, size=(2, 1, *patch)).astype(np.float32)
    with torch.no_grad():
        feats = disc(torch.from_numpy(x))
    np.savez(
        os.path.join(disc_dir, "activations.npz"),
        input=x,
        logits=feats[-1].numpy(),  # training consumes [-1] (train_vae.py:400)
    )
    torch.save(disc.state_dict(), os.path.join(disc_dir, "state_dict.pth"))
    print(f"Wrote discriminator dump to {disc_dir}")


def dump_unet(ldm_config_file: str, checkpoint: str | None, out_dir: str) -> None:
    """Reference DiffusionUNet wrapper (MONAI DiffusionModelUNet) dump.

    Also verifies the converter's expected torch key set against the real
    ``state_dict()`` and fails with an explicit diff on layout drift — the
    UNet converter cannot be validated inside the zero-egress build image
    (``checkpoint/unet_convert.py`` module docstring)."""
    import torch

    sys.path.insert(0, _reference_src())
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pti_ldm_vae.models.unet import DiffusionUNet  # type: ignore

    from pti_ldm_vae_tpu.checkpoint.unet_convert import (
        canonicalize_torch_key,
        unet_expected_torch_keys,
    )

    with open(ldm_config_file, encoding="utf-8") as fh:
        cfg = json.load(fh)
    diffusion_def = cfg["diffusion_def"] if "diffusion_def" in cfg else cfg

    torch.manual_seed(0)
    model = DiffusionUNet.from_config(diffusion_def).eval()
    if checkpoint:
        raw = torch.load(checkpoint, map_location="cpu", weights_only=False)
        model.load_state_dict(raw.get("unet_state_dict", raw))

    sd = model.state_dict()
    expected = set(unet_expected_torch_keys(diffusion_def))
    # Canonicalize accepted spelling variants first — an install using an
    # _ALTERNATES spelling converts fine and must not fail the drift check.
    actual = {canonicalize_torch_key(k) for k in sd.keys()}
    if expected != actual:
        missing = sorted(expected - actual)[:20]
        extra = sorted(actual - expected)[:20]
        raise SystemExit(
            "UNet converter layout drift vs this MONAI install!\n"
            f"  converter expects but MONAI lacks: {missing}\n"
            f"  MONAI has but converter ignores:  {extra}\n"
            "Fix the mapping in pti_ldm_vae_tpu/checkpoint/unet_convert.py "
            "(the _ALTERNATES table handles known spelling variants)."
        )

    lch = diffusion_def["in_channels"]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, lch, 32, 32)).astype(np.float32)
    t = np.asarray([0, 500], dtype=np.int64)
    ctx = rng.standard_normal(
        (2, 16, diffusion_def.get("cross_attention_dim", 512))
    ).astype(np.float32)
    with torch.no_grad():
        eps = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx))

    unet_dir = os.path.join(out_dir, "unet")
    os.makedirs(unet_dir, exist_ok=True)
    np.savez(
        os.path.join(unet_dir, "activations.npz"),
        input=x, timesteps=t, context=ctx, eps=eps.numpy(),
    )
    torch.save(sd, os.path.join(unet_dir, "state_dict.pth"))
    with open(os.path.join(unet_dir, "diffusion_def.json"), "w", encoding="utf-8") as fh:
        json.dump(dict(diffusion_def), fh, indent=2)
    print(f"Wrote UNet dump to {unet_dir} (key set verified against MONAI)")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config_file")
    parser.add_argument("rest", nargs="+", help="[checkpoint.pth] out_dir")
    parser.add_argument("--discriminator", action="store_true",
                        help="Also dump the PatchDiscriminator (out_dir/disc)")
    parser.add_argument("--unet", action="store_true",
                        help="CONFIG is an LDM config; dump the UNet instead")
    args = parser.parse_args(argv)
    checkpoint, out_dir = (args.rest if len(args.rest) == 2 else (None, args.rest[0]))

    if args.unet:
        dump_unet(args.config_file, checkpoint, out_dir)
        return
    dump_vae(args.config_file, checkpoint, out_dir)
    if args.discriminator:
        dump_discriminator(args.config_file, checkpoint, out_dir)


if __name__ == "__main__":
    main()
