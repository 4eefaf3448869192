"""Latent diffusion: noise schedule, DDIM sampling (``lax.scan``), train step, PTI.

The reference keeps its diffusion path dormant (SURVEY.md §0) but the north
star includes the LDM DDIM loop and pivotal-tuning inversion. TPU-first
design:

* ``NoiseSchedule`` — DDPM linear-beta schedule (MONAI scheduler defaults:
  1000 train steps, beta 1e-4 .. 2e-2) as precomputed constant arrays,
* ``ddim_sample`` — the entire deterministic (eta=0) DDIM loop is one
  ``lax.scan`` over timesteps inside a single jitted program: zero host
  round-trips per step,
* ``make_diffusion_train_step`` — epsilon-prediction MSE on VAE latents with
  optional cross-attention conditioning, one jitted program,
* ``pivotal_tuning_inversion`` — stage 1: optimize a per-image latent to
  reconstruct the target through the frozen decoder; stage 2: fine-tune the
  decoder around the pivot latent. Both stages are jitted ``lax.scan`` loops.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "NoiseSchedule",
    "add_noise",
    "ddim_sample",
    "make_diffusion_train_step",
    "pivotal_tuning_inversion",
    "pivotal_tuning_inversion_batched",
    "make_pivotal_tuning_inversion_batched",
]


class NoiseSchedule(NamedTuple):
    betas: jnp.ndarray           # [T]
    alphas_cumprod: jnp.ndarray  # [T]
    num_train_timesteps: int

    @classmethod
    def linear_beta(
        cls, num_train_timesteps: int = 1000,
        beta_start: float = 1e-4, beta_end: float = 2e-2,
    ) -> "NoiseSchedule":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return cls(betas, alphas_cumprod, num_train_timesteps)


def add_noise(schedule: NoiseSchedule, latents: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(a_t) x_0 + sqrt(1-a_t) eps."""
    a = schedule.alphas_cumprod[timesteps]
    shape = (-1,) + (1,) * (latents.ndim - 1)
    return jnp.sqrt(a).reshape(shape) * latents + jnp.sqrt(1.0 - a).reshape(shape) * noise


def ddim_sample(
    unet_apply: Callable,
    params: Any,
    schedule: NoiseSchedule,
    shape: tuple[int, ...],
    rng: jax.Array,
    *,
    num_inference_steps: int = 50,
    context: jnp.ndarray | None = None,
    eta: float = 0.0,
    initial_noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Deterministic DDIM sampling, fully on-device via ``lax.scan``.

    ``unet_apply(params, x, timesteps, context) -> eps_pred``.
    ``initial_noise``: optional pre-made x_T (e.g. a mesh-sharded array so
    the sample batch splits across chips); defaults to fresh N(0, 1).
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    timesteps = (jnp.arange(num_inference_steps) * step_ratio)[::-1]  # descending
    rng, init_rng = jax.random.split(rng)
    x = initial_noise if initial_noise is not None else jax.random.normal(
        init_rng, shape, dtype=jnp.float32
    )

    def body(carry, step_idx):
        x, rng = carry
        t = timesteps[step_idx]
        t_prev = t - step_ratio
        a_t = schedule.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, schedule.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)

        t_batch = jnp.full((shape[0],), t, dtype=jnp.int32)
        eps = unet_apply(params, x, t_batch, context)

        x0_pred = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.sqrt(1.0 - a_t / a_prev)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        rng, noise_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, shape, dtype=jnp.float32)
        x_next = jnp.sqrt(a_prev) * x0_pred + dir_xt + sigma * noise
        return (x_next, rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(num_inference_steps))
    return x


def make_diffusion_train_step(
    unet,
    schedule: NoiseSchedule,
    tx: optax.GradientTransformation,
    *,
    projector=None,
    donate: bool = False,
):
    """Jitted epsilon-MSE train step over (params, opt_state).

    ``params`` is ``{"unet": ..., "projector": ...?}``; conditioning latents
    [B, h, w, C] are projected to context tokens when a projector is given
    (reference conditioning recipe, ``models/README.md:113-126``).

    CALLER CONTRACT when ``donate=True``: the (params, opt_state) argument
    buffers are DONATED to XLA — on TPU they are deleted after the call, so
    any later touch of the old pytrees (e.g. an eval against pre-update
    params) raises a deleted-buffer error.  Donation is a no-op on CPU, so
    CPU tests will not catch a violation.  Opt in only from loops that
    immediately rebind both (``params, opt_state, loss = step(params,
    opt_state, ...)``); the default is the safe non-donating step.
    """

    def loss_fn(params, latents, cond_latents, rng):
        rng_t, rng_noise = jax.random.split(rng)
        batch = latents.shape[0]
        timesteps = jax.random.randint(rng_t, (batch,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(rng_noise, latents.shape, dtype=jnp.float32)
        noisy = add_noise(schedule, latents, noise, timesteps)
        context = None
        if projector is not None and cond_latents is not None:
            b, h, w, c = cond_latents.shape
            tokens = cond_latents.reshape(b, h * w, c)
            context = projector.apply(params["projector"], tokens)
        eps_pred = unet.apply(params["unet"], noisy, timesteps, context)
        return jnp.mean(jnp.square(eps_pred - noise))

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, latents, cond_latents, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, latents, cond_latents, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def pivotal_tuning_inversion(
    decode_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    decoder_params: Any,
    target: jnp.ndarray,
    latent_init: jnp.ndarray,
    *,
    latent_steps: int = 200,
    latent_lr: float = 1e-1,
    tune_steps: int = 100,
    tune_lr: float = 1e-4,
) -> tuple[jnp.ndarray, Any, dict[str, jnp.ndarray]]:
    """Two-stage PTI: invert a pivot latent, then fine-tune the decoder.

    ``decode_fn(params, z) -> image``; both stages run as jitted ``lax.scan``
    loops (the per-image optimization batches trivially across a mesh by
    vmapping over targets).
    Returns (pivot_latent, tuned_decoder_params, losses).
    """

    def recon_loss(z, params):
        return jnp.mean(jnp.square(decode_fn(params, z) - target))

    # ---- stage 1: latent optimization (frozen decoder) ----
    latent_tx = optax.adam(latent_lr)

    @jax.jit
    def invert(z0):
        opt0 = latent_tx.init(z0)

        def body(carry, _):
            z, opt = carry
            loss, grads = jax.value_and_grad(recon_loss)(z, decoder_params)
            updates, opt = latent_tx.update(grads, opt, z)
            return (optax.apply_updates(z, updates), opt), loss

        (z, _), losses = jax.lax.scan(body, (z0, opt0), None, length=latent_steps)
        return z, losses

    pivot, latent_losses = invert(latent_init)

    # ---- stage 2: decoder fine-tune around the pivot ----
    tune_tx = optax.adam(tune_lr)

    @jax.jit
    def tune(params0):
        opt0 = tune_tx.init(params0)

        def body(carry, _):
            params, opt = carry
            loss, grads = jax.value_and_grad(lambda p: recon_loss(pivot, p))(params)
            updates, opt = tune_tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        (params, _), losses = jax.lax.scan(body, (params0, opt0), None, length=tune_steps)
        return params, losses

    tuned_params, tune_losses = tune(decoder_params)
    return pivot, tuned_params, {"latent": latent_losses, "tune": tune_losses}


def make_pivotal_tuning_inversion_batched(
    decode_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    *,
    latent_steps: int = 200,
    latent_lr: float = 1e-1,
    tune_steps: int = 100,
    tune_lr: float = 1e-4,
    mesh=None,
    tune_formulation: str = "scan",
) -> Callable:
    """Build the batched-PTI program ONCE; call it per batch.

    Each image's inversion and decoder fine-tune are independent. Stage 1
    (inversion) is ``vmap`` over the batch axis: the decoder params are
    FROZEN and shared (``in_axes=None``), so the decode lowers to ordinary
    batched convolutions — occupancy rises with batch for free. Stage 2
    (decoder fine-tune) produces per-image decoder weights, and its
    formulation is the perf-critical choice (``tune_formulation``):

    * ``"scan"`` (default) — ``lax.scan`` over the images: ONE image's
      decoder params + Adam state are live at a time, convs stay ordinary
      (batch-1 weights), total time is exactly B x the single-image tune
      time (linear). Fixes the vmap formulation's superlinear pathology
      (measured 15.2x step time for 8x images on v5e, round-4 bench).
    * ``"vmap"`` — legacy: per-image decoder copies make every conv a
      feature-grouped conv with B x weight traffic; kept for A/B.

    With ``mesh`` given, the stage runs under ``shard_map`` over the mesh
    ``data`` axis: every chip runs its local shard's optimization loops
    concurrently (no cross-device communication — embarrassingly
    parallel). ``shard_map`` rather than plain sharded-``jit`` because the
    per-image decoder copies defeat GSPMD propagation (grouped-conv group
    axis for vmap; stacked scan outputs for scan); per-device local loops
    sidestep it entirely. Per-image results are bit-comparable to
    :func:`pivotal_tuning_inversion` (tested on the CPU mesh).

    The returned callable ``(decoder_params, targets, latent_inits) ->
    (pivots, tuned_params, losses)`` carries the jit cache: build it once
    outside the batch loop (re-calling this factory re-traces — full-program
    remote compiles take minutes on a TPU tunnel). ``targets``:
    [B, *spatial, C]; with ``mesh``, B must divide the mesh ``data`` axis
    (pad via ``parallel.mesh.place_batch``). Returns per call:
    ``(pivots [B, ...], tuned_params with a leading B axis on every leaf,
    losses {latent/tune: [B, steps]})``.
    """
    if tune_formulation not in ("scan", "vmap"):
        raise ValueError(
            f"tune_formulation must be 'scan' or 'vmap', got {tune_formulation!r}")
    latent_tx = optax.adam(latent_lr)
    tune_tx = optax.adam(tune_lr)

    def _recon_loss(z, params, target_b):
        return jnp.mean(jnp.square(decode_fn(params, z[None]) - target_b))

    def invert_one(frozen, target, z0):
        target_b = target[None]

        def invert_body(carry, _):
            z, opt = carry
            loss, grads = jax.value_and_grad(_recon_loss)(z, frozen, target_b)
            updates, opt = latent_tx.update(grads, opt, z)
            return (optax.apply_updates(z, updates), opt), loss

        (pivot, _), latent_losses = jax.lax.scan(
            invert_body, (z0, latent_tx.init(z0)), None, length=latent_steps
        )
        return pivot, latent_losses

    def tune_one(frozen, target, pivot):
        target_b = target[None]

        def tune_body(carry, _):
            params, opt = carry
            loss, grads = jax.value_and_grad(
                lambda p: _recon_loss(pivot, p, target_b))(params)
            updates, opt = tune_tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        (tuned, _), tune_losses = jax.lax.scan(
            tune_body, (frozen, tune_tx.init(frozen)), None,
            length=tune_steps,
        )
        return tuned, tune_losses

    def single(frozen, target, z0):
        pivot, latent_losses = invert_one(frozen, target, z0)
        tuned, tune_losses = tune_one(frozen, target, pivot)
        return pivot, tuned, {"latent": latent_losses, "tune": tune_losses}

    def run_vmap(params, targets, latent_inits):
        return jax.vmap(single, in_axes=(None, 0, 0))(params, targets, latent_inits)

    def run_scan(params, targets, latent_inits):
        # stage 1: vmapped inversion — frozen shared decoder, batched z:
        # ordinary convs, full-batch occupancy.
        pivots, latent_losses = jax.vmap(
            invert_one, in_axes=(None, 0, 0))(params, targets, latent_inits)

        # stage 2: scan over images — one live decoder copy at a time.
        def scan_body(_, inputs):
            target, pivot = inputs
            tuned, tune_losses = tune_one(params, target, pivot)
            return None, (tuned, tune_losses)

        _, (tuned_all, tune_losses) = jax.lax.scan(
            scan_body, None, (targets, pivots))
        return pivots, tuned_all, {"latent": latent_losses, "tune": tune_losses}

    run = run_scan if tune_formulation == "scan" else run_vmap

    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return jax.jit(run)

    from jax.sharding import PartitionSpec as P

    # Params enter unvarying (replicated); without disabling varying-ness
    # tracking, the AD transpose of their broadcast inserts a psum over
    # `data`, summing every image's decoder gradient into every copy.
    # Per-device tuning must stay independent. The kwarg is check_vma on
    # jax >= 0.8 and check_rep on the older experimental shim.
    try:
        from jax import shard_map

        vma_kwargs = {"check_vma": False}
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

        vma_kwargs = {"check_rep": False}

    from ..parallel.mesh import DATA_AXIS, data_sharding, replicated

    data_size = mesh.shape[DATA_AXIS]
    sharded = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        **vma_kwargs,
    ))

    def call(decoder_params, targets, latent_inits):
        if targets.shape[0] % data_size:
            raise ValueError(
                f"batch {targets.shape[0]} must divide the mesh data axis "
                f"({data_size}); pad via parallel.mesh.place_batch"
            )
        decoder_params = jax.device_put(decoder_params, replicated(mesh))
        targets = jax.device_put(targets, data_sharding(mesh, targets.ndim))
        latent_inits = jax.device_put(
            latent_inits, data_sharding(mesh, latent_inits.ndim)
        )
        return sharded(decoder_params, targets, latent_inits)

    return call


def pivotal_tuning_inversion_batched(
    decode_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    decoder_params: Any,
    targets: jnp.ndarray,
    latent_inits: jnp.ndarray,
    *,
    latent_steps: int = 200,
    latent_lr: float = 1e-1,
    tune_steps: int = 100,
    tune_lr: float = 1e-4,
    mesh=None,
    tune_formulation: str = "scan",
) -> tuple[jnp.ndarray, Any, dict[str, jnp.ndarray]]:
    """One-shot convenience wrapper around
    :func:`make_pivotal_tuning_inversion_batched`. NOTE: builds (and traces)
    the program on every call — batch loops should build the program once
    via the factory instead (as ``cli/run_pti.py`` does).
    """
    program = make_pivotal_tuning_inversion_batched(
        decode_fn, latent_steps=latent_steps, latent_lr=latent_lr,
        tune_steps=tune_steps, tune_lr=tune_lr, mesh=mesh,
        tune_formulation=tune_formulation,
    )
    return program(decoder_params, targets, latent_inits)
