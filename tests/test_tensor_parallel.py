"""Tensor (channel) sharding over the model axis: numerically identical to
the replicated program, composes with data parallelism, and shards the
optimizer state (parallel/tensor.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pti_ldm_vae_tpu.models.autoencoder_kl import AutoencoderKL
from pti_ldm_vae_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_batch
from pti_ldm_vae_tpu.parallel.tensor import tensor_parallel_params

TINY = dict(
    in_channels=1, out_channels=1, latent_channels=2,
    channels=(8, 16), num_res_blocks=1, norm_num_groups=4,
    attention_levels=(False, True),
    with_encoder_nonlocal_attn=True, with_decoder_nonlocal_attn=True,
)


def _model_and_params():
    model = AutoencoderKL(**TINY)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x, jax.random.key(1))
    return model, params, x


def test_tensor_parallel_params_shard_channels():
    _, params, _ = _model_and_params()
    mesh = make_mesh(jax.devices(), data=4, model=2)
    placed = tensor_parallel_params(mesh, params)
    # an 8-out-channel conv kernel shards its O axis; the 2-channel latent
    # quant conv stays replicated
    k = placed["params"]["encoder"]["conv_in"]["kernel"]
    assert k.sharding.spec == P(None, None, None, MODEL_AXIS)
    q = placed["params"]["quant_conv_mu"]["kernel"]
    assert q.sharding.spec == P()
    # sharded leaves actually split across devices
    assert len({s.device for s in k.addressable_shards}) == 8
    assert k.addressable_shards[0].data.shape[-1] == 4  # 8 / model=2


def test_tensor_plus_data_sharding_matches_replicated():
    model, params, x = _model_and_params()
    f = jax.jit(lambda p, xx: model.apply(
        p, xx, method=model.reconstruct_deterministic))
    expected = f(params, x)

    mesh = make_mesh(jax.devices(), data=4, model=2)
    params_tp = tensor_parallel_params(mesh, params)
    batch = shard_batch(mesh, {"image": x})
    got = f(params_tp, batch["image"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-5)


def test_tensor_parallel_train_step_matches_replicated():
    """Full generator train step (grads + Adam) under tp2 x dp4 equals the
    replicated run, and the updated params / optimizer state keep their
    channel sharding (the ZeRO-ish split)."""
    from pti_ldm_vae_tpu.models.lpips import init_lpips_params
    from pti_ldm_vae_tpu.train.state import create_train_state
    from pti_ldm_vae_tpu.train.steps import LossConfig, make_train_step

    model, params, x = _model_and_params()
    lcfg = LossConfig(recon_loss="l1", kl_weight=1e-3, perceptual_weight=1.0,
                      adv_weight=0.0, ar_vae_enabled=False, use_perceptual=True)
    lpips = init_lpips_params()
    mask = jnp.ones((4,), jnp.float32)
    step = make_train_step(model, None, lcfg, adv_active=False, donate=False)

    state_ref = create_train_state(params, lr=1e-4)
    new_ref, metrics_ref = step(state_ref, x, mask, {}, lpips, jax.random.key(3))

    mesh = make_mesh(jax.devices(), data=4, model=2)
    params_tp = tensor_parallel_params(mesh, params)
    state_tp = create_train_state(params_tp, lr=1e-4)
    batch = shard_batch(mesh, {"image": x, "mask": mask})
    new_tp, metrics_tp = step(
        state_tp, batch["image"], batch["mask"], {}, lpips, jax.random.key(3))

    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_tp[k]), float(metrics_ref[k]), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_ref.params_g),
                    jax.tree.leaves(new_tp.params_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
    # updated params keep the channel sharding GSPMD was given
    k = new_tp.params_g["params"]["encoder"]["conv_in"]["kernel"]
    assert k.sharding.spec == P(None, None, None, MODEL_AXIS)
    # Adam moments are sharded the same way (optimizer-state split)
    mom = jax.tree.leaves(new_tp.opt_state_g)
    sharded_moments = [
        m for m in mom
        if getattr(m, "ndim", 0) == 4 and m.sharding.spec == P(None, None, None, MODEL_AXIS)
    ]
    assert sharded_moments, "no channel-sharded Adam moment found"
