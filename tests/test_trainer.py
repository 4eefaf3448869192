"""End-to-end trainer smoke tests on a synthetic dataset (SURVEY.md §4:
the reference's own harness is exactly this — short run, loss decreases,
checkpoints and samples appear)."""

import json
import os

import numpy as np
import pytest

from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.train.loop import VAETrainer, resolve_ar_settings

# fast tier excludes this module (VAETrainer end-to-end epochs)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    (root / "dente").mkdir()
    for i in range(16):
        img = rng.uniform(0.1, 1.0, size=(32, 32)).astype(np.float32)
        img[:4] = 0.0
        write_tif(str(root / "dente" / f"dente_{i:03d}.tif"), img)
    return root


def _config(dataset_dir, run_dir, **train_overrides):
    train = {
        "batch_size": 4,
        "patch_size": [32, 32],
        "lr": 1e-3,
        "perceptual_weight": 0.0,
        "kl_weight": 1e-4,
        "recon_loss": "l1",
        "adv_enabled": False,
        "adv_weight": 0.5,
        "ar_vae_enabled": False,
        "max_epochs": 2,
        "val_interval": 1,
    }
    train.update(train_overrides)
    return {
        "data_base_dir": str(dataset_dir),
        "run_dir": str(run_dir),
        "resume_ckpt": False,
        "data_source": "dente",
        "train_split": 0.75,
        "val_dir": None,
        "spatial_dims": 2,
        "image_channels": 1,
        "latent_channels": 2,
        "autoencoder_def": {
            "spatial_dims": 2,
            "in_channels": 1,
            "out_channels": 1,
            "latent_channels": 2,
            "channels": [8, 16],
            "num_res_blocks": 1,
            "norm_num_groups": 4,
            "norm_eps": 1e-6,
            "attention_levels": [False, False],
            "with_encoder_nonlocal_attn": False,
            "with_decoder_nonlocal_attn": False,
        },
        "autoencoder_train": train,
        "wandb": {"enabled": False},
    }


@pytest.fixture(scope="module")
def e2e_run(dataset, tmp_path_factory):
    """One shared 2-epoch training run (trace capture at step 2 included)."""
    run_dir = tmp_path_factory.mktemp("e2e") / "run"
    trainer = VAETrainer(
        _config(dataset, run_dir), seed=42, num_workers=2, mixed_precision=False,
        trace_at_step=2,
    )
    result = trainer.train()
    return run_dir, trainer, result


def test_trainer_end_to_end(e2e_run):
    run_dir, trainer, result = e2e_run
    assert result["best_val_loss"] < 100.0
    assert result["total_step"] == 2 * len(trainer.train_loader)

    # Artifacts: split json, metrics.jsonl, last + best checkpoints.
    split = json.loads((run_dir / "splits" / "vae_split.json").read_text())
    assert len(split["train_files"]) == 12 and len(split["val_files"]) == 4
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_lines = [l for l in lines if "train/loss_total" in l]
    val_lines = [l for l in lines if "val/recon_loss" in l]
    assert len(train_lines) == result["total_step"]
    assert len(val_lines) == 2
    names = os.listdir(run_dir / "trained_weights")
    assert "autoencoder_last" in names
    assert any(n.startswith("checkpoint_epoch") for n in names)


def test_metrics_contract(e2e_run):
    """Recorded-payload contract test pinning docs/METRICS.md to reality
    (reference WANDB_METRICS.md:1-29): exact key set per metric axis."""
    run_dir, trainer, result = e2e_run
    rows = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]

    train_keys = {
        "train/recon_loss", "train/kl_loss", "train/perceptual_loss",
        "train/adv_gen_loss", "train/adv_disc_loss", "train/loss_total",
        "train/step",
    }
    train_rows = [r for r in rows if "train/loss_total" in r]
    assert len(train_rows) == result["total_step"]
    for r in train_rows:
        assert set(r) - {"_time", "_step"} == train_keys, sorted(r)

    val_keys = {
        "val/recon_loss", "val/kl_loss", "val/perceptual_loss",
        "val/adv_gen_loss", "val/adv_disc_loss", "val/loss_total", "epoch",
    }
    val_rows = [r for r in rows if "val/loss_total" in r]
    assert len(val_rows) == 2  # one per epoch at val_interval=1
    for r in val_rows:
        assert set(r) - {"_time", "_step"} == val_keys, sorted(r)

    # train/triplets panel once per epoch (reference train_vae.py:479-493)
    triplet_rows = [r for r in rows if "train/triplets/count" in r]
    assert len(triplet_rows) == 2 and all(r["train/triplets/count"] == 1 for r in triplet_rows)

    epoch_rows = [r for r in rows if "time_per_epoch" in r]
    assert len(epoch_rows) == 2
    for r in epoch_rows:
        assert set(r) - {"_time"} == {"time_per_epoch", "epoch"}

    # run config captured durably (reference wandb.init config payload,
    # train_vae.py:145-166) + the perceptual-pretrained flag.
    run_config = json.loads((run_dir / "run_config.json").read_text())
    assert {
        "architecture", "spatial_dims", "latent_channels", "channels",
        "num_res_blocks", "batch_size", "lr", "max_epochs", "kl_weight",
        "perceptual_weight", "data_source", "perceptual_pretrained",
    } <= set(run_config)
    assert run_config["perceptual_pretrained"] is False  # no weights in CI


def test_trace_capture(e2e_run):
    """--trace-at-step writes a profiler trace under <run_dir>/traces."""
    run_dir, trainer, result = e2e_run
    trace_root = run_dir / "traces"
    assert trace_root.exists()
    captured = list(trace_root.rglob("*.trace.json.gz")) + list(
        trace_root.rglob("*.xplane.pb")
    )
    assert captured, f"no trace artifacts under {trace_root}"


def test_trainer_overwrite_protection(dataset, tmp_path):
    run_dir = tmp_path / "run2"
    cfg = _config(dataset, run_dir)
    # Constructing a trainer already populates the run dir (split json) —
    # no training needed to arm the protection.
    VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    with pytest.raises(ValueError, match="already exists"):
        VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)


@pytest.mark.slow
def test_trainer_resume(dataset, tmp_path):
    run_dir = tmp_path / "run3"
    cfg = _config(dataset, run_dir, max_epochs=1)
    t1 = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    r1 = t1.train()
    cfg2 = _config(dataset, run_dir, max_epochs=2)
    cfg2["resume_ckpt"] = True
    t2 = VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False)
    assert t2.start_epoch >= 1
    assert t2.total_step == r1["total_step"]
    r2 = t2.train()
    assert r2["total_step"] > r1["total_step"]


@pytest.mark.slow
def test_trainer_with_gan_warmup_transition(dataset, tmp_path):
    """adv_enabled with max_epochs crossing the epoch>5 gate: both compiled
    phases execute."""
    run_dir = tmp_path / "run4"
    # adv_warmup_epochs=1 shrinks the run; the default (5) matches the
    # reference gate and is asserted separately below.
    cfg = _config(dataset, run_dir, adv_enabled=True, max_epochs=3, adv_warmup_epochs=1)
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert trainer._adv_active(1) is False and trainer._adv_active(2) is True
    # The default gate (no adv_warmup_epochs key) is the reference's epoch>5.
    default_trainer = VAETrainer.__new__(VAETrainer)
    default_trainer.adv_enabled = True
    default_trainer.adv_warmup_epochs = 5
    assert default_trainer._adv_active(5) is False and default_trainer._adv_active(6) is True
    trainer.train()
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "train/adv_disc_loss" in line
    ]
    warm = [l for l in lines if l["train/adv_disc_loss"] == 0.0]
    active = [l for l in lines if l["train/adv_disc_loss"] != 0.0]
    assert warm and active


@pytest.mark.slow
def test_trainer_parallelism_block(dataset, tmp_path):
    """`parallelism: {data, spatial}` config block: trainer builds a dp x sp
    mesh and trains through the spatial-sharded path (VERDICT item 8)."""
    run_dir = tmp_path / "run_sp"
    cfg = _config(dataset, run_dir, max_epochs=1)
    cfg["parallelism"] = {"data": 4, "spatial": 2}
    cfg["remat"] = True  # activation checkpointing composes with sharding
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    assert trainer.spatial is True
    assert trainer.model.remat is True
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    # Numerics match a pure-DP non-remat run (spatial partitioning is a
    # layout, remat a schedule — neither is a math change).
    run_dir2 = tmp_path / "run_dp"
    cfg2 = _config(dataset, run_dir2, max_epochs=1)
    VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False).train()
    val_sp = [
        json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    val_dp = [
        json.loads(l) for l in (run_dir2 / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    np.testing.assert_allclose(val_sp, val_dp, rtol=1e-4)


def test_trainer_parallelism_block_validation(dataset, tmp_path):
    cfg = _config(dataset, tmp_path / "run_bad")
    cfg["parallelism"] = {"spatial": 3}  # does not divide 8 devices
    with pytest.raises(ValueError, match="does not divide"):
        VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    cfg = _config(dataset, tmp_path / "run_bad2")
    cfg["parallelism"] = {"spatial": 2, "tensor": 2}  # both want the model axis
    with pytest.raises(ValueError, match="mutually exclusive"):
        VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)


def test_trainer_parallelism_tensor(dataset, tmp_path):
    """`parallelism: {tensor: 2}`: params/optimizer channel-shard over the
    model axis (parallel/tensor.py) and training numerics match pure DP."""
    from jax.sharding import PartitionSpec as P

    run_dir = tmp_path / "run_tp"
    cfg = _config(dataset, run_dir, max_epochs=1)
    cfg["parallelism"] = {"data": 4, "tensor": 2}
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    assert trainer.tensor is True and trainer.spatial is False
    k = trainer.state.params_g["params"]["encoder"]["conv_in"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    run_dir2 = tmp_path / "run_dp_ref"
    cfg2 = _config(dataset, run_dir2, max_epochs=1)
    VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False).train()
    val_tp = [
        json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    val_dp = [
        json.loads(l) for l in (run_dir2 / "metrics.jsonl").read_text().splitlines()
        if "val/recon_loss" in l
    ][-1]["val/recon_loss"]
    np.testing.assert_allclose(val_tp, val_dp, rtol=1e-4)


def test_trainer_norm_stats_one_pass(dataset, tmp_path):
    """Config "norm_stats": "one_pass" trains end-to-end and lands within
    fp-noise of the two-pass default — the trainer-level gate
    tools/flip_norm_stats_default.py runs before flipping the default."""
    run_dir = tmp_path / "run_1p"
    cfg = _config(dataset, run_dir, max_epochs=1)
    cfg["norm_stats"] = "one_pass"
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert trainer.model.norm_stats == "one_pass"
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    run_dir2 = tmp_path / "run_2p"
    cfg2 = _config(dataset, run_dir2, max_epochs=1)
    # pin two_pass explicitly: the default flipped to one_pass, and this
    # test must keep comparing the two formulations (advisor r4 finding)
    cfg2["norm_stats"] = "two_pass"
    trainer2 = VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False)
    assert trainer2.model.norm_stats == "two_pass"
    trainer2.train()

    def last_val(rd):
        return [
            json.loads(l) for l in (rd / "metrics.jsonl").read_text().splitlines()
            if "val/recon_loss" in l
        ][-1]["val/recon_loss"]

    # one epoch of training amplifies the stats-formulation fp difference;
    # bound it loosely — the op/step-level tests pin the tight equivalence
    np.testing.assert_allclose(last_val(run_dir), last_val(run_dir2), rtol=5e-2)


def test_trainer_s2d_stem(dataset, tmp_path):
    """Config "s2d_stem": true trains end-to-end and lands within fp-noise
    of the standard form — unlike the norm-stats flip this is the SAME math
    on a different conv schedule (model-level equivalence pinned by
    tests/test_autoencoder.py::test_s2d_stem_same_params_outputs_and_grads)."""
    run_dir = tmp_path / "run_s2d"
    cfg = _config(dataset, run_dir, max_epochs=1)
    cfg["s2d_stem"] = True
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert trainer.model.s2d_stem is True
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    run_dir2 = tmp_path / "run_std"
    cfg2 = _config(dataset, run_dir2, max_epochs=1)
    # pin the standard form explicitly: the default is now "auto", which at
    # this per-chip batch resolves to "encoder" (s2d_auto_mode)
    cfg2["s2d_stem"] = False
    trainer2 = VAETrainer(cfg2, seed=42, num_workers=2, mixed_precision=False)
    assert trainer2.model.s2d_stem is False
    trainer2.train()

    def last_val(rd):
        return [
            json.loads(l) for l in (rd / "metrics.jsonl").read_text().splitlines()
            if "val/recon_loss" in l
        ][-1]["val/recon_loss"]

    np.testing.assert_allclose(last_val(run_dir), last_val(run_dir2), rtol=2e-2)


def test_resolve_ar_settings():
    cfg = {
        "autoencoder_train": {"ar_vae_enabled": "false", "ar_vae_weight": "@unresolved.ref"},
        "regularized_attributes": {"enabled": True, "gamma": 0.7},
    }
    ar = resolve_ar_settings(cfg)
    assert ar["enabled"] is True
    assert ar["gamma"] == 0.7


def test_trainer_resume_from_reference_checkpoint(dataset, tmp_path):
    """`resume_ckpt: true` + `checkpoint_dir: <file>.pth` resumes from a
    reference full checkpoint (train_vae.py:309-339) — weights, Adam moments,
    and counters all restored."""
    import jax
    import jax.numpy as jnp
    import torch

    from pti_ldm_vae_tpu.checkpoint.torch_convert import to_torch_state_dict
    from pti_ldm_vae_tpu.models.autoencoder_kl import autoencoder_from_config

    run_dir = tmp_path / "run_ref_resume"
    cfg = _config(dataset, run_dir, max_epochs=4)
    arch = cfg["autoencoder_def"]

    model = autoencoder_from_config(arch)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 32, 32, 1)), jax.random.key(4))
    sd = to_torch_state_dict(variables, arch)
    model_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    opt_sd = {
        "state": {
            i: {"step": torch.tensor(50.0),
                "exp_avg": model_sd[k] * 0.0,
                "exp_avg_sq": model_sd[k].abs() * 0.0}
            for i, k in enumerate(model_sd)
        },
        "param_groups": [{"params": list(range(len(model_sd)))}],
    }
    ckpt_path = tmp_path / "checkpoint_epoch2.pth"
    torch.save({
        "epoch": 2,
        "autoencoder_state_dict": model_sd,
        "discriminator_state_dict": None,
        "optimizer_g_state_dict": opt_sd,
        "optimizer_d_state_dict": None,
        "best_val_loss": 0.5,
        "total_step": 77,
    }, ckpt_path)

    cfg["resume_ckpt"] = True
    cfg["checkpoint_dir"] = str(ckpt_path)
    trainer = VAETrainer(cfg, seed=42, num_workers=2, mixed_precision=False)
    assert trainer.start_epoch == 3
    assert trainer.best_val_loss == 0.5
    assert trainer.total_step == 77
    result = trainer.train()  # epoch 3 only
    assert result["total_step"] > 77


def test_validation_image_dumps(e2e_run):
    """The deferred dump path (non-blocking device row refs banked during
    the eval loop, TIF writes after it) produces one [orig|recon|diff] TIF
    trio per val batch on dump epochs (reference ``train_vae.py:598-621``)."""
    from pti_ldm_vae_tpu.data.io import read_image

    run_dir, trainer, _ = e2e_run
    trainer.logger.log = lambda *a, **k: None  # metrics file closed by train()
    trainer.validate(epoch=10)  # >= start_epoch_to_save and divisible by 5

    epoch_dir = run_dir / "validation_samples" / "epoch_10"
    n_batches = len(trainer.val_loader)
    for sub in ("originale", "reconstruction", "diff"):
        files = sorted(os.listdir(epoch_dir / sub))
        assert len(files) == n_batches, (sub, files)
    img = read_image(str(epoch_dir / "originale" / "step000.tif"))
    rec = read_image(str(epoch_dir / "reconstruction" / "step000.tif"))
    assert img.shape == rec.shape == (32, 32)
    assert np.isfinite(img).all() and np.isfinite(rec).all()


def test_trainer_s2d_auto_default_resolves_from_train_profile(dataset, tmp_path):
    """Default config (no "s2d_stem" key) resolves "auto" at construction
    from the TRAIN profile on the per-chip batch — at this tiny batch that
    is "encoder" (s2d_auto_mode), never the model-level inference gate."""
    cfg = _config(dataset, tmp_path / "run_auto", max_epochs=1)
    assert "s2d_stem" not in cfg
    trainer = VAETrainer(cfg, seed=42, num_workers=0, mixed_precision=False)
    assert trainer.model.s2d_stem == "encoder"
