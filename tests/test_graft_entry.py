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
