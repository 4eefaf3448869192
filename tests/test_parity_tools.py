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

# fast tier excludes this module (dump/check/aggregate machinery end-to-end)
pytestmark = pytest.mark.slow


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


def test_full_parity_jax_side(dump_dir, tmp_path, monkeypatch):
    """The turnkey aggregator (run_full_parity.py jax-side) consumes a full
    synthetic dump layout — VAE config dir + disc/ + unet/ + weights/ — and
    writes a passing PARITY_REPORT.json."""
    import shutil

    from pti_ldm_vae_tpu.checkpoint.torch_convert import (
        disc_from_torch_state_dict,
        disc_to_torch_state_dict,
    )
    from pti_ldm_vae_tpu.checkpoint.unet_convert import unet_to_torch_state_dict
    from pti_ldm_vae_tpu.models.discriminator import PatchDiscriminator
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.models.unet import DiffusionUNet
    from tools.run_full_parity import jax_side

    dumps = tmp_path / "dumps"
    dumps.mkdir()
    shutil.copytree(dump_dir, dumps / "vae_tiny")

    # discriminator dump (reference construction: num_layers_d=3, channels=32)
    disc = PatchDiscriminator(spatial_dims=2, num_layers_d=3, channels=32,
                              in_channels=1, out_channels=1)
    dvars = disc.init(jax.random.key(2), jnp.zeros((1, 32, 32, 1)))
    disc_sd = disc_to_torch_state_dict(dvars)
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, size=(2, 1, 32, 32)).astype(np.float32)
    feats = disc.apply(disc_from_torch_state_dict(disc_sd), np.moveaxis(x, 1, -1))
    disc_dir = dumps / "vae_tiny" / "disc"
    disc_dir.mkdir()
    np.savez(disc_dir / "activations.npz", input=x,
             logits=np.moveaxis(np.asarray(feats[-1]), -1, 1))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in disc_sd.items()}, disc_dir / "state_dict.pth")

    # unet dump at the tiny conditioned config
    from test_unet_convert import CFG as UNET_CFG

    unet = DiffusionUNet(
        **{**UNET_CFG, "channels": tuple(UNET_CFG["channels"]),
           "attention_levels": tuple(UNET_CFG["attention_levels"]),
           "num_head_channels": tuple(UNET_CFG["num_head_channels"])}
    )
    uvars = unet.init(jax.random.key(4), jnp.zeros((1, 8, 8, 2)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 6, 12)))
    xu = rng.standard_normal((2, 2, 8, 8)).astype(np.float32)
    tu = np.asarray([0, 5], dtype=np.int64)
    ctx = rng.standard_normal((2, 6, 12)).astype(np.float32)
    eps = unet.apply(uvars, jnp.asarray(np.moveaxis(xu, 1, -1)),
                     jnp.asarray(tu).astype(jnp.int32), jnp.asarray(ctx))
    unet_dir = dumps / "unet"
    unet_dir.mkdir()
    np.savez(unet_dir / "activations.npz", input=xu, timesteps=tu, context=ctx,
             eps=np.moveaxis(np.asarray(eps), -1, 1))
    usd = unet_to_torch_state_dict(uvars, UNET_CFG)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in usd.items()}, unet_dir / "state_dict.pth")
    (unet_dir / "diffusion_def.json").write_text(json.dumps(UNET_CFG))

    # converted-weights dir: flatten an LPIPS tree into the converter's npz layout
    weights_dir = dumps / "weights"
    weights_dir.mkdir()
    flat = {}

    def _flatten(node, prefix=""):
        for key, val in node.items():
            if key == "_pretrained":
                continue
            if isinstance(val, dict):
                _flatten(val, f"{prefix}{key}/")
            else:
                flat[f"{prefix}{key}"] = np.asarray(val)

    _flatten(init_lpips_params())
    np.savez(weights_dir / "lpips_squeeze.npz", **flat)

    monkeypatch.setenv("PTI_LPIPS_WEIGHTS", "unused")  # restored after test
    report_path = tmp_path / "PARITY_REPORT.json"
    rc = jax_side(str(dumps), 1e-3, str(report_path))
    report = json.loads(report_path.read_text())
    assert rc == 0, report
    assert report["overall"] == "ok"
    assert report["configs"]["vae_tiny"]["status"] == "ok"
    assert "disc_logits" in report["configs"]["vae_tiny"]["divergences"]
    assert report["unet"]["status"] == "ok"
    assert report["lpips_evaluate"]["perceptual_pretrained"] is True


def test_full_parity_jax_side_rejects_empty_dumps(tmp_path):
    """A mistyped/empty --dumps dir must hard-fail, not report 'overall ok'
    with zero checks (this is the ONE external run; silence would be worse
    than a crash)."""
    import pytest

    from tools.run_full_parity import jax_side

    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no config dump"):
        jax_side(str(empty), tol=1e-3, report_path=str(tmp_path / "r.json"))


def test_full_parity_jax_side_hard_fails_without_lpips_calibration(
    dump_dir, tmp_path
):
    """A dumps dir WITHOUT converted LPIPS weights must produce overall=FAIL
    (rc=1), never a passing report built on the random-feature fallback —
    the report's whole purpose is executed REAL-weights parity."""
    import shutil

    from tools.run_full_parity import jax_side

    dumps = tmp_path / "dumps"
    dumps.mkdir()
    shutil.copytree(dump_dir, dumps / "vae_tiny")
    # note: NO weights/lpips_squeeze.npz

    report_path = tmp_path / "PARITY_REPORT.json"
    rc = jax_side(str(dumps), 1e-3, str(report_path))
    report = json.loads(report_path.read_text())
    assert rc == 1
    assert report["overall"] == "FAIL"
    assert report["lpips_evaluate"]["status"] == "FAIL"
    assert "PARITY_HANDOFF.md" in report["lpips_evaluate"]["reason"]
