"""Resume training from a REFERENCE full checkpoint (torch ``.pth``).

The reference's ``checkpoint_epoch{N}.pth`` carries both model state dicts,
both Adam optimizer state dicts, and the loop counters
(``vae_scripts/train_vae.py:740-765``; resume path ``:309-339``). This module
converts the whole thing — weights AND Adam first/second moments — into a
:class:`~pti_ldm_vae_tpu.train.state.GanTrainState`, so a training run
started under the torch reference continues here mid-optimizer-trajectory
(torch ``exp_avg``/``exp_avg_sq``/``step`` == optax ``mu``/``nu``/``count``;
both implement the same bias-corrected Adam with eps outside the sqrt).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..train.state import GanTrainState, create_train_state
from .torch_convert import (
    disc_from_torch_state_dict,
    from_torch_state_dict,
    optimizer_tree_from_torch,
)

__all__ = ["load_reference_checkpoint"]


def _inject_adam(opt_state: Any, mu_tree: Any, nu_tree: Any, count: int) -> Any:
    """Replace the ScaleByAdamState inside an ``optax.adam`` state tuple."""
    adam = opt_state[0]
    new_adam = adam._replace(
        count=jnp.asarray(count, jnp.int32), mu=mu_tree, nu=nu_tree
    )
    return (new_adam,) + tuple(opt_state[1:])


def load_reference_checkpoint(
    path: str,
    autoencoder_def: dict,
    *,
    lr: float,
    world_size: int = 1,
    params_d_template: Any | None = None,
    num_layers_d: int = 3,
) -> tuple[GanTrainState, dict]:
    """Full-state resume from a reference ``checkpoint_epoch{N}.pth``.

    ``params_d_template``: freshly-initialized discriminator variables, used
    when the adversarial branch is enabled here but the checkpoint predates
    the discriminator (the reference also falls back to the live module then,
    ``train_vae.py:320-325``).

    Returns ``(state, meta)`` with
    ``meta = {"epoch", "best_val_loss", "total_step"}``.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("autoencoder_state_dict", "optimizer_g_state_dict", "epoch"):
        if key not in raw:
            raise KeyError(
                f"{path} is not a reference full checkpoint (missing {key!r}; "
                f"have {sorted(raw)[:6]})"
            )

    def to_np(sd):
        return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}

    model_sd = to_np(raw["autoencoder_state_dict"])
    params_g = from_torch_state_dict(model_sd, autoencoder_def)

    disc_sd = raw.get("discriminator_state_dict")
    params_d = (
        disc_from_torch_state_dict(to_np(disc_sd), num_layers_d)
        if disc_sd else params_d_template
    )

    state = create_train_state(
        params_g, lr=lr, world_size=world_size, params_d=params_d
    )

    mu_g, nu_g, count_g = optimizer_tree_from_torch(
        raw["optimizer_g_state_dict"], model_sd, config=autoencoder_def
    )
    state = state.replace(
        step=jnp.asarray(count_g, jnp.int32),
        opt_state_g=_inject_adam(state.opt_state_g, mu_g, nu_g, count_g),
    )

    opt_d_sd = raw.get("optimizer_d_state_dict")
    if disc_sd and opt_d_sd and state.tx_d is not None:
        mu_d, nu_d, count_d = optimizer_tree_from_torch(
            opt_d_sd, to_np(disc_sd), kind="discriminator", num_layers_d=num_layers_d
        )
        state = state.replace(
            opt_state_d=_inject_adam(state.opt_state_d, mu_d, nu_d, count_d)
        )

    meta = {
        "epoch": int(raw["epoch"]),
        "best_val_loss": float(raw.get("best_val_loss", 100.0)),
        "total_step": int(raw.get("total_step", count_g)),
    }
    return state, meta
