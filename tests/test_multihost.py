"""Multi-host (2-process) training correctness on CPU (VERDICT item 3).

Spawns two real ``jax.distributed`` processes (localhost rendezvous), each
feeding half of a fixed global batch through ``place_batch``; asserts the
distributed train step's losses and updated parameters equal a single-process
run on the same global batch. This is the property DDP gives the reference
(``utils/distributed.py:8-29``) — gradients identical to large-batch SGD.
"""

import pytest
import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.parallel.mesh import make_mesh, place_batch
from pti_ldm_vae_tpu.train.state import create_train_state
from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _single_process_reference() -> dict:
    """The same step as multihost_worker.py, on this process's 8-device mesh."""
    model = AutoencoderKL(
        in_channels=1, out_channels=1, latent_channels=2, channels=(4,),
        num_res_blocks=1, norm_num_groups=2, attention_levels=(False,),
        with_encoder_nonlocal_attn=False, with_decoder_nonlocal_attn=False,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1))
    state = create_train_state(params, lr=1e-3, world_size=2)
    lcfg = LossConfig(
        recon_loss="l1", kl_weight=1e-3, perceptual_weight=0.0,
        adv_weight=0.0, use_perceptual=False,
    )
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    full = rng.uniform(0.1, 1.0, size=(8, 16, 16, 1)).astype(np.float32)
    batch = place_batch(
        mesh, {"image": full, "mask": np.ones((8,), np.float32), "attributes": {}}
    )
    new_state, metrics = step(
        state, batch["image"], batch["mask"], batch["attributes"], {}, jax.random.key(2)
    )
    out = {k: float(v) for k, v in metrics.items()}
    out["param_fingerprint"] = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(new_state.params_g))
    )
    return out


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        port = sock.getsockname()[1]
    coordinator = f"localhost:{port}"
    out_json = tmp_path / "rank0.json"

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), str(out_json)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=420)
        outputs.append(out)
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}"

    distributed = json.loads(out_json.read_text())
    reference = _single_process_reference()
    assert set(distributed) == set(reference)
    for key in reference:
        np.testing.assert_allclose(
            distributed[key], reference[key], rtol=1e-5, atol=1e-6,
            err_msg=f"metric {key} diverges between 2-process and single-process",
        )
