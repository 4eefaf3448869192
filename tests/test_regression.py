"""Regression stack tests: model, normalizer, loops, CLIs end-to-end."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pti_ldm_vae_tpu.data.io import write_tif
from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.models.regressor import (
    LatentRegressor,
    VAELatentRegressor,
    flatten_latent,
    infer_flat_dim_from_patch,
)
from pti_ldm_vae_tpu.utils.regression_utils import (
    TargetNormalizer,
    build_loss_fn,
    compute_target_normalizer,
    extract_regression_data_config,
    extract_regression_train_config,
    load_regression_checkpoint,
    save_regression_checkpoint,
)

TINY_VAE = dict(
    in_channels=1, out_channels=1, latent_channels=2,
    channels=(8, 16), num_res_blocks=1, norm_num_groups=4,
    attention_levels=(False, False),
    with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
)


@pytest.fixture(scope="module")
def vae_and_params():
    model = AutoencoderKL(**TINY_VAE)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    return model, variables


def test_flatten_latent_torch_order():
    x = jnp.arange(2 * 3 * 3 * 2).reshape(2, 3, 3, 2).astype(jnp.float32)  # NHWC
    flat = flatten_latent(x)
    import torch

    t = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)  # NCHW
    expected = torch.flatten(t, start_dim=1).numpy()
    np.testing.assert_array_equal(np.asarray(flat), expected)


def test_infer_flat_dim(vae_and_params):
    model, variables = vae_and_params
    dim = infer_flat_dim_from_patch(model, variables, (16, 16))
    assert dim == 2 * 8 * 8  # latent 2ch, one downsample from 16


def test_latent_regressor_shapes(vae_and_params):
    vae, variables = vae_and_params
    head = LatentRegressor(hidden_dims=(32,), output_dim=3, dropout=0.1, activation="gelu")
    model = VAELatentRegressor(vae, variables, head, latent_dim=128)
    params = model.init_head(jax.random.key(0))
    preds = model.apply(params, jnp.zeros((4, 16, 16, 1)))
    assert preds.shape == (4, 3)
    # dropout active when rngs given, deterministic otherwise
    p1 = model.apply(params, jnp.ones((2, 16, 16, 1)))
    p2 = model.apply(params, jnp.ones((2, 16, 16, 1)))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_bad_activation_raises():
    head = LatentRegressor(hidden_dims=(8,), output_dim=1, activation="tanh")
    with pytest.raises(ValueError, match="Unsupported activation"):
        head.init(jax.random.key(0), jnp.zeros((1, 4)))


def test_target_normalizer_roundtrip():
    targets = np.random.default_rng(0).normal(loc=5.0, scale=3.0, size=(20, 4)).astype(np.float32)
    norm = compute_target_normalizer(targets)
    normalized = norm.normalize(targets)
    np.testing.assert_allclose(normalized.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(norm.denormalize(normalized), targets, rtol=1e-5)
    # zero-std column -> std floor 1.0
    constant = np.ones((10, 1), dtype=np.float32)
    norm2 = compute_target_normalizer(constant)
    assert norm2.std[0] == 1.0
    with pytest.raises(ValueError, match="Target order mismatch"):
        TargetNormalizer.from_dict(norm.to_dict(["a", "b", "c", "d"]), ["b", "a", "c", "d"])


def test_build_loss_fn_matches_torch():
    import torch

    pred = np.random.default_rng(1).normal(size=(6, 3)).astype(np.float32)
    tgt = np.random.default_rng(2).normal(size=(6, 3)).astype(np.float32)
    mse = build_loss_fn("mse")
    np.testing.assert_allclose(
        float(mse(jnp.asarray(pred), jnp.asarray(tgt))),
        float(torch.nn.MSELoss()(torch.from_numpy(pred), torch.from_numpy(tgt))),
        rtol=1e-6,
    )
    huber = build_loss_fn("smooth_l1")
    np.testing.assert_allclose(
        float(huber(jnp.asarray(pred), jnp.asarray(tgt))),
        float(torch.nn.SmoothL1Loss()(torch.from_numpy(pred), torch.from_numpy(tgt))),
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        build_loss_fn("mae")


def test_config_schema_normalization():
    cfg = {
        "data_base_dir": "/x", "attributes_path": "/a.json", "patch_size": [32, 32],
        "train": {"batch_size": 4, "lr": 1e-3, "max_epochs": 2, "seed": 7},
    }
    data_cfg = extract_regression_data_config(cfg)
    assert data_cfg["seed"] == 7 and data_cfg["data_source"] == "edente"
    train_cfg = extract_regression_train_config(cfg)
    assert train_cfg["val_interval"] == 1 and train_cfg["loss"] == "mse"
    with pytest.raises(KeyError):
        extract_regression_data_config({"data": {}})


def test_head_checkpoint_roundtrip(tmp_path):
    head = LatentRegressor(hidden_dims=(8,), output_dim=2)
    params = head.init(jax.random.key(0), jnp.zeros((1, 16)))
    save_regression_checkpoint(tmp_path / "head", params, ["a", "b"], epoch=3, latent_dim=16)
    loaded, meta = load_regression_checkpoint(tmp_path / "head", ["a", "b"], params)
    assert meta["epoch"] == 3
    for leaf_a, leaf_b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    with pytest.raises(ValueError, match="Target mismatch"):
        load_regression_checkpoint(tmp_path / "head", ["b", "a"], params)


def test_torch_head_checkpoint_loads(tmp_path):
    """Reference head_best.pth format loads through the converter path."""
    import torch

    torch_head = torch.nn.Sequential(
        torch.nn.Linear(16, 8), torch.nn.ReLU(), torch.nn.Linear(8, 2)
    )
    ckpt = {
        "regressor_state_dict": {f"mlp.{k}": v for k, v in torch_head.state_dict().items()},
        "targets": ["a", "b"],
        "epoch": 5,
        "latent_dim": 16,
    }
    # torch Sequential names are "0.weight" etc; reference uses mlp.N.weight
    ckpt["regressor_state_dict"] = {
        k.replace("mlp.", "mlp."): v for k, v in ckpt["regressor_state_dict"].items()
    }
    path = tmp_path / "head_best.pth"
    torch.save(ckpt, path)
    params, meta = load_regression_checkpoint(path, ["a", "b"])
    assert meta["epoch"] == 5
    # Forward equivalence torch vs jax
    head = LatentRegressor(hidden_dims=(8,), output_dim=2, activation="relu")
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    ours = np.asarray(head.apply(params, jnp.asarray(x)))
    theirs = torch_head(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def regression_workspace(tmp_path_factory, vae_and_params):
    """Synthetic dataset + saved VAE checkpoint + regression config file."""
    from pti_ldm_vae_tpu.checkpoint.orbax_io import save_pytree

    root = tmp_path_factory.mktemp("reg_ws")
    data = root / "data" / "edente"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    attrs = {}
    for i in range(12):
        img = rng.uniform(0.1, 1.0, size=(16, 16)).astype(np.float32)
        name = f"edente_{i:03d}.tif"
        write_tif(str(data / name), img)
        attrs[name] = {"height_0": float(i), "width_0": float(2 * i)}
    (root / "attributes.json").write_text(json.dumps(attrs))

    vae_model, vae_variables = vae_and_params
    save_pytree(str(root / "vae_ckpt"), vae_variables)
    vae_cfg = {
        "autoencoder_def": {
            "spatial_dims": 2, "in_channels": 1, "out_channels": 1,
            "latent_channels": 2, "channels": [8, 16], "num_res_blocks": 1,
            "norm_num_groups": 4, "norm_eps": 1e-6,
            "attention_levels": [False, False],
            "with_encoder_nonlocal_attn": False, "with_decoder_nonlocal_attn": False,
        },
        "autoencoder_train": {"patch_size": [16, 16]},
    }
    (root / "vae_config.json").write_text(json.dumps(vae_cfg))

    reg_cfg = {
        "run_dir": str(root / "runs" / "reg"),
        "targets": ["height_0", "width_0"],
        "vae": {"config_file": str(root / "vae_config.json"), "checkpoint": str(root / "vae_ckpt")},
        "regressor_def": {"hidden_dims": [16], "dropout": 0.0, "activation": "relu"},
        "data": {
            "data_base_dir": str(root / "data"),
            "attributes_path": str(root / "attributes.json"),
            "patch_size": [16, 16],
            "seed": 42,
        },
        "regression_train": {
            "batch_size": 4, "lr": 1e-2, "max_epochs": 2,
            "target_norm": "standard", "loss": "mse",
        },
        "wandb": {"enabled": False},
    }
    cfg_path = root / "reg_config.json"
    cfg_path.write_text(json.dumps(reg_cfg))
    return root, cfg_path


def test_train_regression_cli(regression_workspace):
    root, cfg_path = regression_workspace
    from pti_ldm_vae_tpu.cli.train_regression import main

    result = main(["-c", str(cfg_path)])
    assert result["best_val"] < float("inf")
    weights = root / "runs" / "reg" / "trained_weights"
    assert (weights / "head_last").exists()
    assert (weights / "head_best").exists()
    assert (weights / "target_norm_stats.json").exists()


def test_evaluate_regression_cli(regression_workspace):
    root, cfg_path = regression_workspace
    from pti_ldm_vae_tpu.cli.evaluate_regression import main

    metrics = main([
        "-c", str(cfg_path),
        "--checkpoint", str(root / "runs" / "reg" / "trained_weights" / "head_best"),
    ])
    assert "mae" in metrics and "mae_height_0" in metrics
    assert np.isfinite(metrics["val_loss"])


def test_inference_regression_cli(regression_workspace):
    root, cfg_path = regression_workspace
    from pti_ldm_vae_tpu.cli.inference_regression import main

    payload = main([
        "-c", str(cfg_path),
        "--checkpoint", str(root / "runs" / "reg" / "trained_weights" / "head_best"),
        "--input-dir", str(root / "data" / "edente"),
        "--num-samples", "5",
    ])
    assert len(payload["predictions"]) == 5
    assert set(payload["predictions"][0]) == {"file", "height_0", "width_0"}
