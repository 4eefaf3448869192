"""Checkpointing: orbax pytree save/load with the reference's best/last semantics.

Reference behavior (``train_vae.py:675-769``, SURVEY.md §5.4):

* every validation: overwrite ``autoencoder_last`` (+ ``discriminator_last``),
* on val improvement: write per-epoch ``autoencoder_epoch{N}`` /
  ``discriminator_epoch{N}`` / full ``checkpoint_epoch{N}`` (models +
  optimizers + epoch + best_val_loss + total_step) and delete the previous
  best's files,
* resume restores both models, both optimizers, epoch, best_val, step
  (``train_vae.py:309-339``).

Orbax stores pytrees as directories; this module wraps it with those naming
conventions and a tiny JSON sidecar for the scalar bookkeeping.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_pytree",
    "load_pytree",
    "CheckpointManager",
]


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree checkpoint directory (overwrites).

    Leaves are fetched to host numpy first: jitted train states carry
    compiler-assigned (GSPMD) shardings that orbax cannot serialize — it
    would write ``sharding=None`` and the checkpoint becomes unrestorable.
    Host arrays also make checkpoints topology-portable (restore never
    depends on the mesh they were saved under). Multi-host callers save
    replicated trees from process 0 (all leaves addressable).
    """
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    tree = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_pytree(path: str, target: Any | None = None) -> Any:
    """Load a pytree checkpoint; ``target`` restores concrete dtypes/shapes."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=target)
        return ckptr.restore(path)


class CheckpointManager:
    """Best/last checkpoint bookkeeping with reference-equivalent semantics."""

    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self.best_epoch_saved: int | None = None

    # -- last -------------------------------------------------------------
    def save_last(self, params_g: Any, params_d: Any | None = None) -> None:
        save_pytree(os.path.join(self.model_dir, "autoencoder_last"), params_g)
        if params_d:
            save_pytree(os.path.join(self.model_dir, "discriminator_last"), params_d)

    # -- best -------------------------------------------------------------
    def save_best(
        self,
        epoch: int,
        *,
        state: Any,
        val_loss: float,
        best_val_loss: float,
        total_step: int,
    ) -> float:
        """Save the full resume state when ``val_loss`` improves; returns the
        new best value. Deletes the previous best's files like the reference
        (``train_vae.py:729-737``)."""
        if val_loss >= best_val_loss:
            return best_val_loss
        if self.best_epoch_saved is not None:
            for stem in (
                f"checkpoint_epoch{self.best_epoch_saved}",
                f"autoencoder_epoch{self.best_epoch_saved}",
                f"discriminator_epoch{self.best_epoch_saved}",
            ):
                full = os.path.join(self.model_dir, stem)
                if os.path.exists(full):
                    shutil.rmtree(full)
            meta_old = os.path.join(
                self.model_dir, f"checkpoint_epoch{self.best_epoch_saved}.json"
            )
            if os.path.exists(meta_old):
                os.remove(meta_old)

        save_pytree(os.path.join(self.model_dir, f"autoencoder_epoch{epoch}"), state.params_g)
        if state.params_d:
            save_pytree(
                os.path.join(self.model_dir, f"discriminator_epoch{epoch}"), state.params_d
            )
        save_pytree(
            os.path.join(self.model_dir, f"checkpoint_epoch{epoch}"),
            {
                "params_g": state.params_g,
                "params_d": state.params_d,
                "opt_state_g": state.opt_state_g,
                "opt_state_d": state.opt_state_d,
            },
        )
        with open(
            os.path.join(self.model_dir, f"checkpoint_epoch{epoch}.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(
                {"epoch": epoch, "best_val_loss": float(val_loss), "total_step": int(total_step)},
                fh,
            )
        self.best_epoch_saved = epoch
        return float(val_loss)

    # -- resume -----------------------------------------------------------
    def find_latest_full(self) -> tuple[str, dict] | None:
        """Locate the newest ``checkpoint_epoch{N}`` + sidecar."""
        best = None
        for name in os.listdir(self.model_dir):
            if name.startswith("checkpoint_epoch") and name.endswith(".json"):
                with open(os.path.join(self.model_dir, name), encoding="utf-8") as fh:
                    meta = json.load(fh)
                if best is None or meta["epoch"] > best[1]["epoch"]:
                    best = (os.path.join(self.model_dir, name[: -len(".json")]), meta)
        return best

    def restore(self, state_template: Any) -> tuple[Any, dict] | None:
        """Restore the full train state from the newest best checkpoint
        (reference resume semantics, ``train_vae.py:309-339``)."""
        found = self.find_latest_full()
        if found is None:
            return None
        path, meta = found
        target = {
            "params_g": state_template.params_g,
            "params_d": state_template.params_d,
            "opt_state_g": state_template.opt_state_g,
            "opt_state_d": state_template.opt_state_d,
        }
        tree = load_pytree(path, target)
        state = state_template.replace(
            params_g=tree["params_g"],
            params_d=tree["params_d"],
            opt_state_g=tree["opt_state_g"],
            opt_state_d=tree["opt_state_d"],
            step=jax.numpy.asarray(meta["total_step"], dtype=np.int32),
        )
        self.best_epoch_saved = meta["epoch"]
        return state, meta
