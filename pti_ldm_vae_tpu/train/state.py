"""Train state: generator + optional discriminator, two Adam optimizers.

Equivalent of the reference's mutable training objects (models + two
``torch.optim.Adam`` instances, ``train_vae.py:287-306``), re-designed as one
immutable pytree so the whole step is a pure function under ``jit`` and the
state can be donated buffer-for-buffer each step.

LR x world_size scaling is applied by the caller (reference
``train_vae.py:301-304``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["GanTrainState", "create_train_state"]


class GanTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    opt_state_g: Any
    params_d: Any          # empty dict when the adversarial branch is off
    opt_state_d: Any
    tx_g: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation | None = struct.field(pytree_node=False)

    def apply_g(self, grads):
        updates, new_opt = self.tx_g.update(grads, self.opt_state_g, self.params_g)
        return self.replace(
            step=self.step + 1,
            params_g=optax.apply_updates(self.params_g, updates),
            opt_state_g=new_opt,
        )

    def apply_d(self, grads):
        updates, new_opt = self.tx_d.update(grads, self.opt_state_d, self.params_d)
        return self.replace(
            params_d=optax.apply_updates(self.params_d, updates),
            opt_state_d=new_opt,
        )


def create_train_state(
    params_g: Any,
    *,
    lr: float,
    world_size: int = 1,
    params_d: Any | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
) -> GanTrainState:
    """Adam with torch defaults (eps=1e-8), lr scaled by world size
    (reference ``train_vae.py:301-304``)."""
    tx_g = optax.adam(lr * world_size, b1=b1, b2=b2, eps=1e-8)
    tx_d = optax.adam(lr * world_size, b1=b1, b2=b2, eps=1e-8) if params_d is not None else None
    return GanTrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params_g=params_g,
        opt_state_g=tx_g.init(params_g),
        params_d=params_d if params_d is not None else {},
        opt_state_d=tx_d.init(params_d) if tx_d is not None else {},
        tx_g=tx_g,
        tx_d=tx_d,
    )
