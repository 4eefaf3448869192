"""Small-utility coverage: multihost no-op, profiling timer, dotenv,
visualization helpers."""

import os

import numpy as np

from pti_ldm_vae_tpu.parallel.multihost import maybe_initialize_distributed
from pti_ldm_vae_tpu.utils.logging import load_dotenv
from pti_ldm_vae_tpu.utils.profiling import StepTimer, trace_if
from pti_ldm_vae_tpu.utils.visualization import (
    normalize_batch_for_display,
    normalize_image_to_uint8,
    visualize_2d_image,
    visualize_one_slice_in_3d_image,
)


def test_multihost_noop_single_process():
    # No coordinator env, single host -> returns False, no initialization.
    assert maybe_initialize_distributed() is False
    assert maybe_initialize_distributed() is False  # idempotent


def test_step_timer():
    timer = StepTimer()
    for _ in range(5):
        timer.tick()
    summary = timer.summary()
    assert summary["steps"] == 5
    assert summary["p50_s"] >= 0 and summary["max_s"] >= summary["p50_s"]
    assert StepTimer().summary() == {}


def test_trace_if_disabled_is_noop(tmp_path):
    with trace_if(str(tmp_path), enabled=False):
        pass
    assert list(tmp_path.iterdir()) == []


def test_load_dotenv(tmp_path, monkeypatch):
    env_file = tmp_path / ".env"
    env_file.write_text("WANDB_PROJECT=from-dotenv\n# comment\nWANDB_ENTITY='team'\n")
    monkeypatch.delenv("WANDB_PROJECT", raising=False)
    monkeypatch.setenv("WANDB_ENTITY", "preexisting")
    load_dotenv(str(env_file))
    assert os.environ["WANDB_PROJECT"] == "from-dotenv"
    assert os.environ["WANDB_ENTITY"] == "preexisting"  # env wins
    monkeypatch.delenv("WANDB_PROJECT")


def test_display_normalization_reference_semantics():
    batch = np.zeros((1, 8, 8, 1), dtype=np.float32)
    batch[0, 2:6, 2:6, 0] = np.linspace(0.5, 2.0, 16).reshape(4, 4)
    out = normalize_batch_for_display(batch)
    assert out.shape == batch.shape
    assert out.min() >= 0 and out.max() <= 1
    assert np.all(out[0, 0, :, 0] == 0)  # background stays black
    # all-zero image -> all zeros, no NaN
    zero = normalize_batch_for_display(np.zeros((1, 4, 4, 1), np.float32))
    assert np.all(zero == 0)


def test_uint8_and_rgb_helpers():
    img = np.linspace(-1, 1, 16).reshape(4, 4).astype(np.float32)
    u8 = normalize_image_to_uint8(img)
    assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0
    rgb = visualize_2d_image(img)
    assert rgb.shape == (4, 4, 3)
    vol = np.random.default_rng(0).uniform(size=(4, 4, 6)).astype(np.float32)
    slice_rgb = visualize_one_slice_in_3d_image(vol, axis=2)
    assert slice_rgb.shape == (4, 4, 3)
    import pytest

    with pytest.raises(ValueError):
        visualize_one_slice_in_3d_image(vol, axis=5)
