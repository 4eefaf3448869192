#!/usr/bin/env python
"""Convert reference torch AutoencoderKL checkpoints <-> this framework's orbax.

    # torch -> orbax (parity runs: load reference-trained weights)
    python tools/convert_torch_checkpoint.py to-jax CKPT.pth CONFIG.json OUT_DIR

    # orbax -> torch-format numpy state dict (.npz with MONAI key names,
    # loadable into the reference via a tiny torch-side shim)
    python tools/convert_torch_checkpoint.py to-torch ORBAX_DIR CONFIG.json OUT.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pti_ldm_vae_tpu.checkpoint.orbax_io import load_pytree, save_pytree  # noqa: E402
from pti_ldm_vae_tpu.checkpoint.torch_convert import (  # noqa: E402
    from_torch_state_dict,
    to_torch_state_dict,
)
from pti_ldm_vae_tpu.config import load_config  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("direction", choices=["to-jax", "to-torch"])
    parser.add_argument("source")
    parser.add_argument("config_file")
    parser.add_argument("dest")
    args = parser.parse_args()

    cfg = load_config(args.config_file)
    ae_def = cfg["autoencoder_def"]

    if args.direction == "to-jax":
        import torch

        raw = torch.load(args.source, map_location="cpu", weights_only=False)
        state_dict = raw.get("autoencoder_state_dict", raw) if isinstance(raw, dict) else raw
        state_dict = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                      for k, v in state_dict.items()}
        variables = from_torch_state_dict(state_dict, ae_def)
        save_pytree(args.dest, variables)
        print(f"Wrote orbax checkpoint: {args.dest}")
    else:
        variables = load_pytree(args.source)
        if "params_g" in variables:
            variables = variables["params_g"]
        sd = to_torch_state_dict(variables, ae_def)
        np.savez(args.dest, **sd)
        print(f"Wrote MONAI-named state dict ({len(sd)} tensors): {args.dest}")


if __name__ == "__main__":
    main()
