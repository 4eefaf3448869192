"""Driver entry points stay healthy: multi-chip dryrun on the CPU mesh."""

import pytest
import sys


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    # conftest already provides 8 virtual CPU devices; the dryrun's fallback
    # branch must not trigger (it would clear backends mid-suite).
    import jax

    assert jax.device_count() == 8
    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_driverlike_subprocess():
    """Run dryrun_multichip(8) the way the driver does: a clean subprocess,
    no pytest conftest, the axon TPU plugin registered on PYTHONPATH (it may
    be unreachable — the round-3 MULTICHIP timeout), under a hard timeout.

    The dryrun is a CPU-mesh correctness check and must never block on TPU
    backend init (__graft_entry__._force_cpu_mesh re-points JAX before any
    jax.devices() touch)."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    pythonpath = "/root/repo"
    if os.path.isdir("/root/.axon_site"):
        pythonpath += ":/root/.axon_site"
    env["PYTHONPATH"] = pythonpath
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    assert "dryrun_multichip(8): ok" in proc.stdout
    assert "LDM stage ok" in proc.stdout
