"""Child process for the 2-process ``jax.distributed`` test (not a test file).

Usage: python multihost_worker.py <coordinator> <process_id> <out_json>

Each of the 2 processes owns 2 virtual CPU devices (4 global), receives half
of a fixed GLOBAL batch of 8, assembles it via ``place_batch``
(``jax.make_array_from_process_local_data``), and runs one full VAE train
step over the 4-device mesh. Process 0 writes the metrics + a parameter
fingerprint; the parent test asserts they equal a single-process run on the
same global batch (the DDP-equivalence property the reference gets from
``torchrun`` + NCCL, ``distributed.py:8-29``).
"""

import json
import os
import sys

# Config must precede first backend use; scrub any inherited device forcing.
os.environ.pop("XLA_FLAGS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

coordinator, process_id, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=process_id
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL  # noqa: E402
from pti_ldm_vae_tpu.parallel.mesh import barrier_sync, make_mesh, place_batch  # noqa: E402
from pti_ldm_vae_tpu.train.state import create_train_state  # noqa: E402
from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()
barrier_sync("start")

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

mesh = make_mesh()  # all 4 global devices on the data axis
rng = np.random.default_rng(0)
full = rng.uniform(0.1, 1.0, size=(8, 16, 16, 1)).astype(np.float32)  # GLOBAL batch
local = full[process_id * 4 : (process_id + 1) * 4]
batch = place_batch(
    mesh, {"image": local, "mask": np.ones((4,), np.float32), "attributes": {}}
)
assert batch["image"].shape == (8, 16, 16, 1), batch["image"].shape

new_state, metrics = step(
    state, batch["image"], batch["mask"], batch["attributes"], {}, jax.random.key(2)
)
out = {k: float(v) for k, v in metrics.items()}
out["param_fingerprint"] = float(
    sum(jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(new_state.params_g))
)
barrier_sync("end")

if process_id == 0:
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(out, fh)
jax.distributed.shutdown()
