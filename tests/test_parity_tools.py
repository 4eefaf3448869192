"""The dump/check parity tooling works end-to-end (tool machinery test).

``tools/dump_reference_activations.py`` needs torch+MONAI and runs elsewhere;
here we fabricate a dump in ITS exact format from the repo's own MONAI-layout
torch mirror (``test_torch_parity.TMirror``) and assert
``tools/check_reference_parity.py`` passes it — and fails it loudly when a
weight is perturbed beyond tolerance.
"""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pti_ldm_vae_tpu.checkpoint.torch_convert import to_torch_state_dict
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from test_torch_parity import CFG, TMirror, _load_mirror_from_converter
from tools.check_reference_parity import check, main as check_main


@pytest.fixture(scope="module")
def dump_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_dump")
    model = AutoencoderKL(
        **{**CFG, "channels": tuple(CFG["channels"]),
           "attention_levels": tuple(CFG["attention_levels"])}
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)), jax.random.key(1))
    mirror = TMirror(CFG).eval()
    _load_mirror_from_converter(mirror, variables)

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=(2, CFG["in_channels"], 32, 32)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        z_mu, z_sigma = mirror.encode(xt)
        recon = mirror.decode(z_mu)
    np.savez(out / "activations.npz", input=x, z_mu=z_mu.numpy(),
             z_sigma=z_sigma.numpy(), recon_det=recon.numpy())
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(variables, CFG).items()}
    torch.save(sd, out / "state_dict.pth")
    (out / "autoencoder_def.json").write_text(json.dumps(CFG))
    return out


def test_parity_checker_passes_on_faithful_dump(dump_dir):
    divergences = check(str(dump_dir))
    assert max(divergences.values()) <= 1e-3, divergences
    assert check_main([str(dump_dir)]) == 0


def test_parity_checker_fails_on_perturbed_weights(dump_dir, tmp_path):
    import shutil

    bad = tmp_path / "bad_dump"
    shutil.copytree(dump_dir, bad)
    sd = torch.load(bad / "state_dict.pth", weights_only=False)
    key = next(k for k in sd if k.endswith("conv.weight"))
    sd[key] = sd[key] + 0.05
    torch.save(sd, bad / "state_dict.pth")
    assert check_main([str(bad)]) == 1
