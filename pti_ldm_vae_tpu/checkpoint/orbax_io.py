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

import atexit
import json
import os
import queue
import shutil
import sys
import threading
from typing import Any, Callable

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "fetch_to_host",
    "save_pytree",
    "load_pytree",
    "CheckpointManager",
]


def fetch_to_host(tree: Any) -> Any:
    """Device -> host numpy for every jax.Array leaf.

    Host numpy trees are safe to hand to a background writer thread: they
    hold no device buffers, so the train loop's donated-state updates cannot
    invalidate them mid-write."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


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
    tree = fetch_to_host(tree)
    # Write to a sibling tmp dir first, swap in only once complete: a crash
    # mid-write leaves the previous checkpoint intact instead of a
    # half-written directory.  The swap is two renames (path -> .old,
    # tmp -> path); a crash exactly between them leaves no dir at ``path``
    # but the full data at ``.old`` — recoverable, unlike the plain
    # rmtree-then-rename this replaced (which could destroy the only copy).
    # A stale ``.old`` from such a crash is therefore deleted only AFTER
    # the new tmp write has fully succeeded: until then it may be the only
    # surviving checkpoint, and removing it first would reintroduce the
    # all-copies-gone window on a second failure mid-write.
    tmp = path + ".tmp"
    old = path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # torn tmp from a crashed write: never the only copy
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(tmp, tree)
    if os.path.exists(old):
        shutil.rmtree(old)  # safe now: tmp holds a complete new checkpoint
    had_prev = os.path.exists(path)
    if had_prev:
        os.rename(path, old)
    os.rename(tmp, path)
    if had_prev:
        shutil.rmtree(old)


class _AsyncWriter:
    """Single background thread executing disk writes in submission order.

    Ordering matters (the JSON sidecar must land after its tree; the
    previous best's deletion must not race its replacement), so one worker
    drains a FIFO queue. Failures are re-raised on the next ``submit`` or
    ``wait`` — a checkpoint that silently failed to write would be worse
    than a crashed run."""

    def __init__(self, sentinel_dir: str | None = None) -> None:
        self._queue: queue.Queue = queue.Queue()
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None
        # On abnormal-exit drain failure, a sentinel file lands here so
        # humans and resume tooling can tell the run is NOT resumable even
        # when the crash output buries the stderr message.
        self._sentinel_dir = sentinel_dir

    def _worker(self) -> None:
        while True:
            fn = self._queue.get()
            if fn is None:
                self._queue.task_done()
                return
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001 — surfaced on wait()
                self._exc = exc
            finally:
                self._queue.task_done()

    def submit(self, fn: Callable[[], None]) -> None:
        self._raise_pending()
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._worker, name="ckpt-writer", daemon=True
            )
            self._thread.start()
            # Drain pending writes even on abnormal exit (an exception
            # propagating out of the train loop never reaches wait());
            # without this the daemon thread dies mid-write at teardown.
            atexit.register(self._drain_at_exit)
        self._queue.put(fn)

    def _drain_at_exit(self) -> None:
        if self._thread is None:
            return
        self._queue.join()
        if self._exc is not None:
            import sys

            exc, self._exc = self._exc, None  # report once
            msg = f"[ERROR] background checkpoint write failed: {exc!r}"
            print(msg, file=sys.stderr, flush=True)
            if self._sentinel_dir is not None:
                try:
                    with open(
                        os.path.join(self._sentinel_dir, "CHECKPOINT_WRITE_FAILED"),
                        "w", encoding="utf-8",
                    ) as fh:
                        fh.write(msg + "\n")
                except OSError:
                    pass  # the same full disk that failed the write

    def wait(self) -> None:
        """Block until every submitted write has finished."""
        self._queue.join()
        self._raise_pending()

    def _raise_pending(self) -> None:
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("background checkpoint write failed") from exc


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
        # A sentinel from a previous run means its last best/last write
        # FAILED (disk full, crash): the on-disk checkpoints may be stale.
        # Deleting it here would destroy the marker before any resume logic
        # could see it, so it is only surfaced loudly; it is cleared when a
        # NEW checkpoint write succeeds (_clear_sentinel from save paths).
        self._sentinel = os.path.join(self.model_dir, "CHECKPOINT_WRITE_FAILED")
        if os.path.exists(self._sentinel):
            print(
                f"[WARN] {self._sentinel} exists: the previous run's final "
                f"checkpoint write FAILED — on-disk best/last may be stale. "
                f"The marker clears on the next successful write.",
                file=sys.stderr, flush=True,
            )
        self.best_epoch_saved: int | None = None
        self._writer = _AsyncWriter(sentinel_dir=self.model_dir)

    def _clear_sentinel(self) -> None:
        try:
            os.remove(self._sentinel)
        except FileNotFoundError:
            pass

    def wait(self) -> None:
        """Drain pending background checkpoint writes (call before exit or
        before reading a just-saved checkpoint)."""
        self._writer.wait()

    # -- per-epoch combined save (hot path) --------------------------------
    def save_epoch(
        self,
        *,
        state: Any,
        epoch: int,
        val_loss: float,
        best_val_loss: float,
        total_step: int,
    ) -> float:
        """One epoch's checkpoint work: overwrite ``last``, and on val
        improvement write the per-epoch best + full resume state — with ONE
        device->host fetch shared by both, and all disk writes on the
        background thread (the train loop resumes dispatching immediately;
        the reference blocks its epoch on torch.save, ``train_vae.py:675-769``).

        Returns the new best val loss."""
        improved = val_loss < best_val_loss
        host = {
            "params_g": fetch_to_host(state.params_g),
            "params_d": fetch_to_host(state.params_d),
        }
        if improved:
            host["opt_state_g"] = fetch_to_host(state.opt_state_g)
            host["opt_state_d"] = fetch_to_host(state.opt_state_d)

        def write_last() -> None:
            save_pytree(os.path.join(self.model_dir, "autoencoder_last"), host["params_g"])
            if host["params_d"]:
                save_pytree(
                    os.path.join(self.model_dir, "discriminator_last"), host["params_d"]
                )
            # a successful fresh write supersedes any stale failure marker
            self._clear_sentinel()

        self._writer.submit(write_last)
        if not improved:
            return best_val_loss

        prev_best, self.best_epoch_saved = self.best_epoch_saved, epoch

        def write_best() -> None:
            # Write the new best BEFORE deleting the previous one: if the
            # write fails, the old best survives (restore picks the highest
            # epoch, so the transient overlap is harmless).
            self._write_best_files(
                epoch, host, val_loss=float(val_loss), total_step=int(total_step)
            )
            if prev_best is not None:
                self._delete_best_files(prev_best)

        self._writer.submit(write_best)
        return float(val_loss)

    def _delete_best_files(self, epoch: int) -> None:
        for stem in (
            f"checkpoint_epoch{epoch}",
            f"autoencoder_epoch{epoch}",
            f"discriminator_epoch{epoch}",
        ):
            full = os.path.join(self.model_dir, stem)
            if os.path.exists(full):
                shutil.rmtree(full)
        meta_old = os.path.join(self.model_dir, f"checkpoint_epoch{epoch}.json")
        if os.path.exists(meta_old):
            os.remove(meta_old)

    def _write_best_files(
        self, epoch: int, tree: dict[str, Any], *, val_loss: float, total_step: int
    ) -> None:
        save_pytree(os.path.join(self.model_dir, f"autoencoder_epoch{epoch}"), tree["params_g"])
        if tree["params_d"]:
            save_pytree(
                os.path.join(self.model_dir, f"discriminator_epoch{epoch}"), tree["params_d"]
            )
        save_pytree(
            os.path.join(self.model_dir, f"checkpoint_epoch{epoch}"),
            {
                "params_g": tree["params_g"],
                "params_d": tree["params_d"],
                "opt_state_g": tree["opt_state_g"],
                "opt_state_d": tree["opt_state_d"],
            },
        )
        # Sidecar lands atomically (tmp + os.replace): resume scans for the
        # .json, so a torn sidecar would orphan an otherwise-complete best.
        sidecar = os.path.join(self.model_dir, f"checkpoint_epoch{epoch}.json")
        sidecar_tmp = sidecar + ".tmp"
        with open(sidecar_tmp, "w", encoding="utf-8") as fh:
            json.dump(
                {"epoch": epoch, "best_val_loss": float(val_loss), "total_step": int(total_step)},
                fh,
            )
        os.replace(sidecar_tmp, sidecar)

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
        (``train_vae.py:729-737``). Synchronous — the train loop uses
        :meth:`save_epoch` instead."""
        if val_loss >= best_val_loss:
            return best_val_loss
        host = {
            "params_g": fetch_to_host(state.params_g),
            "params_d": fetch_to_host(state.params_d),
            "opt_state_g": fetch_to_host(state.opt_state_g),
            "opt_state_d": fetch_to_host(state.opt_state_d),
        }
        self._write_best_files(epoch, host, val_loss=float(val_loss), total_step=int(total_step))
        if self.best_epoch_saved is not None:
            self._delete_best_files(self.best_epoch_saved)
        self.best_epoch_saved = epoch
        return float(val_loss)

    # -- resume -----------------------------------------------------------
    def find_latest_full(self) -> tuple[str, dict] | None:
        """Locate the newest ``checkpoint_epoch{N}`` + sidecar."""
        self._writer.wait()  # a pending background write may hold the newest
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
