#!/usr/bin/env python
"""TURNKEY real-weights parity pipeline (the ONE external step).

This zero-egress build image cannot hold real LPIPS/VGG16/MONAI weights, so
final numeric parity evidence needs exactly one run on a machine with
egress. This script is that run, both halves:

torch-side (egress machine, reference checkout available)::

    python tools/run_full_parity.py torch-side \
        --reference /path/to/reference --out parity_dumps/ [--install]

  * ``--install`` pip-installs the reference's pins (torch, monai==1.5.1,
    lpips, torchvision — ``uv.lock:859-861``),
  * converts LPIPS-squeeze + VGG16 weights into ``out/weights/``,
  * dumps VAE + discriminator activations/state-dicts for EVERY
    ``vae*/ar*`` reference config (``tools/dump_reference_activations.py``),
  * dumps the MONAI DiffusionModelUNet at the flagship ``ldm_dente``
    architecture (with mechanical converter-key verification).

jax-side (back on this framework, after copying ``parity_dumps/``)::

    python tools/run_full_parity.py jax-side --dumps parity_dumps/ \
        [--tol 1e-3] [--report PARITY_REPORT.json]

  * runs every dumped bundle through the MONAI-key converters and this
    framework's models (exact f32 mode), recording max divergences,
  * loads the converted LPIPS weights and runs an LPIPS-calibrated
    ``evaluate_vae`` on synthetic data (proves ``perceptual_pretrained``
    flips true end-to-end),
  * writes one ``PARITY_REPORT.json`` with per-item status vs the 1e-3 bar.

The jax-side half is covered against synthetic dumps by
``tests/test_parity_tools.py::test_full_parity_jax_side``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

REFERENCE_PINS = ["torch==2.7.*", "monai==1.5.1", "lpips", "torchvision", "tifffile"]


# --------------------------------------------------------------------------
# torch side
# --------------------------------------------------------------------------

def torch_side(reference: str, out: str, install: bool, dry: bool = False) -> int:
    if install and not dry:
        subprocess.check_call([sys.executable, "-m", "pip", "install", *REFERENCE_PINS])

    os.makedirs(out, exist_ok=True)
    weights_dir = os.path.join(out, "weights")
    os.makedirs(weights_dir, exist_ok=True)

    if dry:
        # Zero-egress validation of the handoff plumbing: check every input
        # the real run needs (reference checkout layout, configs, converter
        # scripts) and print the execution plan without importing lpips/
        # torchvision or downloading anything.
        cfg_dir = os.path.join(reference, "config")
        vae_configs = sorted(
            p for p in glob.glob(os.path.join(cfg_dir, "*.json"))
            if os.path.basename(p).startswith(("vae", "ar_vae"))
        )
        problems = []
        if not vae_configs:
            problems.append(f"no vae*/ar_vae* configs under {cfg_dir}")
        for script in ("convert_lpips_weights.py", "convert_vgg16_weights.py",
                       "dump_reference_activations.py"):
            if not os.path.exists(os.path.join(HERE, script)):
                problems.append(f"missing tool {script}")
        ldm_cfg = os.path.join(REPO, "config", "ldm_dente.json")
        if not os.path.exists(ldm_cfg):
            problems.append(f"missing {ldm_cfg}")
        plan = [
            f"pip install {' '.join(REFERENCE_PINS)}",
            f"convert LPIPS -> {weights_dir}/lpips_squeeze.npz",
            f"convert VGG16 -> {weights_dir}/vgg16_features.npz",
            *(f"dump {os.path.basename(c)} -> {out}/" for c in vae_configs),
            f"dump flagship UNet ({ldm_cfg}) -> {out}/",
        ]
        print(json.dumps({"dry_run": True, "ok": not problems,
                          "problems": problems, "plan": plan}, indent=1))
        return 1 if problems else 0

    print("== converting LPIPS + VGG16 weights ==", flush=True)
    subprocess.check_call([
        sys.executable, os.path.join(HERE, "convert_lpips_weights.py"),
        os.path.join(weights_dir, "lpips_squeeze.npz"),
    ])
    subprocess.check_call([
        sys.executable, os.path.join(HERE, "convert_vgg16_weights.py"),
        os.path.join(weights_dir, "vgg16_features.npz"),
    ])

    cfg_dir = os.path.join(reference, "config")
    vae_configs = sorted(
        p for p in glob.glob(os.path.join(cfg_dir, "*.json"))
        if os.path.basename(p).startswith(("vae", "ar_vae"))
    )
    if not vae_configs:
        raise SystemExit(f"no vae*/ar_vae* configs under {cfg_dir}")
    failures = []
    for cfg in vae_configs:
        name = os.path.splitext(os.path.basename(cfg))[0]
        dump_dir = os.path.join(out, name)
        print(f"== dumping {name} ==", flush=True)
        # Trained checkpoints are optional: random-init dumps still pin the
        # architecture/converter end to end (weights ride the state_dict).
        rc = subprocess.call([
            sys.executable, os.path.join(HERE, "dump_reference_activations.py"),
            cfg, dump_dir, "--discriminator",
        ])
        if rc:
            failures.append(name)

    print("== dumping flagship UNet (ldm_dente diffusion_def) ==", flush=True)
    ldm_cfg = os.path.join(REPO, "config", "ldm_dente.json")
    rc = subprocess.call([
        sys.executable, os.path.join(HERE, "dump_reference_activations.py"),
        ldm_cfg, out, "--unet",
    ])
    if rc:
        failures.append("unet")

    if failures:
        print(f"FAILED dumps: {failures}", file=sys.stderr)
        return 1
    print(f"\nAll dumps in {out}/ — copy the directory to the TPU side and run:\n"
          f"  python tools/run_full_parity.py jax-side --dumps {out}")
    return 0


# --------------------------------------------------------------------------
# jax side
# --------------------------------------------------------------------------

def _evaluate_with_lpips(weights_dir: str, workdir: str) -> dict:
    """LPIPS-calibrated evaluate_vae on synthetic data: proves the converted
    weights load end-to-end (``perceptual_pretrained: true`` in the payload)."""
    import numpy as np

    sys.path.insert(0, REPO)
    from pti_ldm_vae_tpu.cli.evaluate_vae import main as evaluate_main
    from pti_ldm_vae_tpu.data.io import write_tif

    lpips_npz = os.path.join(weights_dir, "lpips_squeeze.npz")
    if not os.path.exists(lpips_npz):
        # HARD FAIL, not a skip: the entire point of the jax-side run is
        # real-weights parity. A report built on the random-feature LPIPS
        # fallback would silently claim parity that was never measured.
        return {
            "status": "FAIL",
            "reason": f"LPIPS calibration weights not found: {lpips_npz} — "
                      "run the torch-side first (see PARITY_HANDOFF.md)",
        }

    data_dir = os.path.join(workdir, "data", "dente")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        write_tif(os.path.join(data_dir, f"dente_{i:03d}.tif"),
                  rng.uniform(0.1, 1.0, size=(32, 32)).astype(np.float32))

    cfg = {
        "data_base_dir": os.path.join(workdir, "data"),
        "run_dir": os.path.join(workdir, "run"),
        "data_source": "dente",
        "spatial_dims": 2, "image_channels": 1, "latent_channels": 2,
        "autoencoder_def": {
            "spatial_dims": 2, "in_channels": 1, "out_channels": 1,
            "latent_channels": 2, "channels": [8, 16], "num_res_blocks": 1,
            "norm_num_groups": 4, "norm_eps": 1e-6,
            "attention_levels": [False, False],
            "with_encoder_nonlocal_attn": False,
            "with_decoder_nonlocal_attn": False,
        },
        "autoencoder_train": {"batch_size": 2, "patch_size": [32, 32],
                              "kl_weight": 1e-3, "perceptual_weight": 1.0},
        "wandb": {"enabled": False},
    }
    cfg_path = os.path.join(workdir, "cfg.json")
    with open(cfg_path, "w", encoding="utf-8") as fh:
        json.dump(cfg, fh)

    import jax
    import jax.numpy as jnp

    from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config

    # two_pass pins the reference's GroupNorm formulation for the parity run
    # (the framework default is the one_pass perf formulation)
    model = autoencoder_from_config(
        cfg["autoencoder_def"], compute_dtype=jnp.float32,
        norm_stats="two_pass")
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1)), jax.random.key(1)
    )
    ckpt = os.path.join(workdir, "ckpt")
    save_pytree(ckpt, variables)

    os.environ["PTI_LPIPS_WEIGHTS"] = lpips_npz
    out_dir = os.path.join(workdir, "eval_out")
    evaluate_main([
        "-c", cfg_path, "--checkpoint", ckpt,
        "--input-dir", data_dir, "--output-dir", out_dir, "--batch-size", "2",
    ])
    with open(os.path.join(out_dir, "metrics.json"), encoding="utf-8") as fh:
        payload = json.load(fh)
    return {
        "status": "ok" if payload.get("perceptual_pretrained") else "FAIL",
        "perceptual_pretrained": payload.get("perceptual_pretrained"),
        "perceptual_loss_mean": payload["metrics"].get("perceptual_loss_mean"),
    }


def jax_side(dumps: str, tol: float, report_path: str) -> int:
    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    from check_reference_parity import check, check_disc, check_unet

    report: dict = {"tol": tol, "configs": {}, "unet": None, "lpips_evaluate": None}
    ok = True

    for dump_dir in sorted(glob.glob(os.path.join(dumps, "*"))):
        if not os.path.isdir(dump_dir) or os.path.basename(dump_dir) in ("weights", "unet"):
            continue
        name = os.path.basename(dump_dir)
        entry: dict = {}
        try:
            entry["divergences"] = check(dump_dir)
            disc_dir = os.path.join(dump_dir, "disc")
            if os.path.isdir(disc_dir):
                entry["divergences"].update(check_disc(disc_dir))
            entry["status"] = (
                "ok" if max(entry["divergences"].values()) <= tol else "FAIL"
            )
        except Exception as exc:  # noqa: BLE001 — per-item status, keep going
            entry["status"] = "ERROR"
            entry["error"] = f"{type(exc).__name__}: {exc}"
        ok &= entry["status"] == "ok"
        report["configs"][name] = entry
        print(f"{name}: {entry}", flush=True)

    if not report["configs"]:
        # an empty/mistyped --dumps dir must not report "overall ok"
        raise SystemExit(f"no config dump directories found under {dumps!r}")

    unet_dir = os.path.join(dumps, "unet")
    if os.path.isdir(unet_dir):
        try:
            div = check_unet(unet_dir)
            report["unet"] = {
                "divergences": div,
                "status": "ok" if max(div.values()) <= tol else "FAIL",
            }
        except Exception as exc:  # noqa: BLE001
            report["unet"] = {"status": "ERROR", "error": f"{type(exc).__name__}: {exc}"}
        ok &= report["unet"]["status"] == "ok"
        print(f"unet: {report['unet']}", flush=True)

    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        report["lpips_evaluate"] = _evaluate_with_lpips(
            os.path.join(dumps, "weights"), workdir
        )
    if report["lpips_evaluate"]["status"] == "FAIL":
        ok = False
    print(f"lpips_evaluate: {report['lpips_evaluate']}", flush=True)

    report["overall"] = "ok" if ok else "FAIL"
    with open(report_path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=2)
    print(f"\n{report['overall'].upper()} -> {report_path}")
    return 0 if ok else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="side", required=True)
    t = sub.add_parser("torch-side")
    t.add_argument("--reference", required=True, help="Reference checkout root")
    t.add_argument("--out", default="parity_dumps")
    t.add_argument("--install", action="store_true",
                   help="pip install the reference's pinned deps first")
    t.add_argument("--dry", action="store_true",
                   help="validate inputs + print the plan without importing "
                        "lpips/torchvision or downloading (zero-egress check)")
    j = sub.add_parser("jax-side")
    j.add_argument("--dumps", required=True)
    j.add_argument("--tol", type=float, default=1e-3)
    j.add_argument("--report", default="PARITY_REPORT.json")
    args = parser.parse_args(argv)
    if args.side == "torch-side":
        return torch_side(args.reference, args.out, args.install, dry=args.dry)
    return jax_side(args.dumps, args.tol, args.report)


if __name__ == "__main__":
    raise SystemExit(main())
