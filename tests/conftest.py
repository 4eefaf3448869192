"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the idiomatic JAX answer is
``--xla_force_host_platform_device_count`` (SURVEY.md §4).

Note: this environment's TPU plugin (axon) registers itself from
``sitecustomize`` and programmatically sets ``jax_platforms``, so the
``JAX_PLATFORMS`` env var alone is NOT sufficient — we must override via
``jax.config`` after import, before any backend is touched.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite is dominated by XLA compiles of
# small repeated programs (~20 min cold). Cached executables cut repeat runs
# to minutes. Env var (not just jax.config) so the multihost subprocess
# workers inherit it.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)

# Tests assume the random-feature fallback; "none" makes the loaders ignore
# any converted weights a user installed under weights/ (tests that exercise
# real weight loading monkeypatch these to explicit paths).
# Force (not setdefault): several tests hard-assert the random-feature
# fallback (perceptual_pretrained is False), so a developer's exported
# weights path must not leak in; tests that exercise real weight loading
# monkeypatch these explicitly.
os.environ["PTI_LPIPS_WEIGHTS"] = "none"
os.environ["PTI_VGG16_WEIGHTS"] = "none"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Make the repo root importable regardless of pytest rootdir resolution.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
