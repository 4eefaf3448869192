"""VAE training orchestration — the ``train_vae`` workload.

Behavioral equivalent of the reference driver (``vae_scripts/train_vae.py``,
call stack in SURVEY.md §3.1): config -> loaders -> models/optimizers ->
epoch loop with per-epoch validation, last/best checkpointing, metric logging,
validation triplet dumps, resume. TPU-first mechanics:

* one jitted train step per GAN phase (warm-up vs active — the reference's
  ``epoch > 5`` gate, ``train_vae.py:399,449``) with donated state,
* batch sharded over the mesh ``data`` axis (DDP equivalent); LR already
  scaled by world size in ``create_train_state``,
* bf16 compute / f32 params by default on TPU (override with
  ``mixed_precision`` config key or parity runs),
* host loader prefetch overlaps IO with device compute.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint.orbax_io import CheckpointManager
from ..config import filter_comment_keys, resolve_bool
from ..data.factory import create_vae_dataloaders
from ..data.io import write_tif
from ..losses.ar_vae import make_ar_vae_spec
from ..losses.composite import compute_total_loss
from ..ops.norm import DEFAULT_NORM_STATS
from ..ops.space_to_depth import s2d_auto_mode
from ..models.autoencoder_kl import autoencoder_from_config
from ..models.discriminator import PatchDiscriminator
from ..models.lpips import load_lpips_params
from ..parallel.mesh import first_row_read, first_row_refs, make_mesh, place_batch
from ..utils.determinism import set_determinism
from ..utils.logging import MetricLogger, init_wandb_config
from ..utils.visualization import normalize_batch_for_display
from .state import create_train_state
from .steps import LossConfig, make_eval_step, make_train_step

__all__ = ["VAETrainer", "resolve_ar_settings"]


def resolve_ar_settings(cfg: dict[str, Any]) -> dict[str, Any]:
    """AR-VAE flags from both config blocks (reference ``train_vae.py:776-792``)."""
    reg = cfg.get("regularized_attributes") or {}
    train = cfg.get("autoencoder_train", {})
    enabled = resolve_bool(train.get("ar_vae_enabled", False)) or resolve_bool(
        reg.get("enabled", False)
    )
    raw_gamma = train.get("ar_vae_weight", reg.get("gamma", 0.0))
    if isinstance(raw_gamma, str):
        try:
            gamma = float(raw_gamma)
        except ValueError:
            gamma = float(reg.get("gamma", 0.0))
    else:
        gamma = float(raw_gamma)
    return {
        "enabled": enabled,
        "gamma": gamma,
        "pairwise": reg.get("pairwise", "all"),
        "subset_pairs": reg.get("subset_pairs"),
        "block": reg,
    }


class VAETrainer:
    def __init__(
        self,
        cfg: dict[str, Any],
        *,
        seed: int = 42,
        num_workers: int = 4,
        cache_rate: float = 0.0,
        subset_size: int | None = None,
        resume: bool | None = None,
        mixed_precision: bool | None = None,
        log_every: int = 1,
        use_wandb: bool | None = None,
        profile_port: int | None = None,
        trace_at_step: int | None = None,
        use_pallas_attention: bool | None = None,
    ):
        self.cfg = cfg
        self.seed = seed
        self.rank = jax.process_index()
        # First-class perf tooling (SURVEY.md §5.1 — absent in the reference):
        # a live profiler endpoint for TensorBoard/xprof attachment, and a
        # one-shot trace capture around a chosen global step.
        self.trace_at_step = trace_at_step
        if profile_port:
            from ..utils.profiling import start_profiler_server

            start_profiler_server(profile_port)
            if self.rank == 0:
                print(f"[INFO] jax.profiler server on port {profile_port}")

        train_cfg = cfg["autoencoder_train"]
        self.batch_size = int(train_cfg["batch_size"])
        # Mesh over ALL devices (global under multi-host): batch rows shard
        # on ``data``; an optional ``parallelism: {spatial: M}`` config block
        # shards image height over ``model`` (resolution scaling,
        # parallel/spatial.py). Batches whose size doesn't divide the data
        # axis are padded with masked rows — no device idles, no gcd games.
        par = cfg.get("parallelism") or {}
        spatial = int(par.get("spatial", 1))
        # ``tensor`` (channel sharding, parallel/tensor.py) and ``spatial``
        # (height sharding) both ride the mesh ``model`` axis — exclusive.
        tensor = int(par.get("tensor", 1))
        if spatial > 1 and tensor > 1:
            raise ValueError(
                "parallelism 'spatial' and 'tensor' are mutually exclusive "
                "(both shard over the model axis)")
        model_par = max(spatial, tensor)
        n_dev = jax.device_count()
        if n_dev % model_par:
            raise ValueError(
                f"spatial/tensor={model_par} does not divide {n_dev} devices")
        data = int(par.get("data", n_dev // model_par))
        if data * model_par > n_dev:
            raise ValueError(
                f"parallelism data={data} x model={model_par} exceeds {n_dev} devices"
            )
        if data * model_par < n_dev and jax.process_count() > 1:
            raise ValueError("multi-host runs must use every device in the mesh")
        self.mesh = make_mesh(jax.devices()[: data * model_par], data=data, model=model_par)
        self.spatial = spatial > 1
        self.tensor = tensor > 1
        # LR x world_size rule: world = PROCESS count (each process's loader
        # adds batch_size samples to the global batch, like a DDP rank —
        # reference ``train_vae.py:301-304``). Chips within one process share
        # a single batch_size batch and do not scale the LR.
        self.world = jax.process_count()
        self.patch_size = tuple(train_cfg["patch_size"])
        self.max_epochs = int(train_cfg["max_epochs"])
        self.val_interval = int(train_cfg.get("val_interval", 1))
        self.adv_enabled = resolve_bool(train_cfg.get("adv_enabled", True))
        # Reference hardcodes the adversarial warm-up at epoch > 5
        # (train_vae.py:399,449); configurable here with that default.
        self.adv_warmup_epochs = int(train_cfg.get("adv_warmup_epochs", 5))
        self.run_dir = Path(cfg["run_dir"])
        self.model_dir = self.run_dir / "trained_weights"
        self.resume = resolve_bool(cfg.get("resume_ckpt", False)) if resume is None else resume
        self.log_every = log_every

        ar = resolve_ar_settings(cfg)
        self.ar = ar

        if mixed_precision is None:
            mixed_precision = jax.default_backend() == "tpu"
        compute_dtype = jnp.bfloat16 if mixed_precision else jnp.float32

        # Overwrite protection (reference ``train_vae.py:794-803``).
        if self.rank == 0:
            if self.run_dir.exists() and not self.resume and any(self.run_dir.iterdir()):
                raise ValueError(
                    f"Run directory already exists: {self.run_dir}\n"
                    "Change 'run_dir' in the config or set 'resume_ckpt: true'."
                )
            self.model_dir.mkdir(parents=True, exist_ok=True)
            (self.run_dir / "splits").mkdir(parents=True, exist_ok=True)

        self.root_key = set_determinism(seed)

        # ---- data -------------------------------------------------------
        self.train_loader, self.val_loader, train_paths, val_paths = create_vae_dataloaders(
            cfg["data_base_dir"],
            batch_size=self.batch_size,
            patch_size=self.patch_size,
            rank=self.rank,
            data_source=cfg.get("data_source", "edente"),
            train_split=cfg.get("train_split", 0.9),
            num_workers=num_workers,
            seed=seed,
            subset_size=subset_size,
            val_dir=cfg.get("val_dir"),
            cache_rate=cache_rate,
            world_size=jax.process_count(),
            ar_vae_enabled=ar["enabled"],
            regularized_attributes=ar["block"] or None,
        )
        if self.rank == 0:
            split_payload = {
                "seed": seed,
                "train_split": cfg.get("train_split", 0.9),
                "subset_size": subset_size,
                "val_dir": cfg.get("val_dir"),
                "train_files": list(train_paths),
                "val_files": list(val_paths),
            }
            with open(self.run_dir / "splits" / "vae_split.json", "w", encoding="utf-8") as fh:
                json.dump(split_payload, fh, indent=2)

        # ---- models -------------------------------------------------------
        # "remat": true (our extension, default off) rematerializes block
        # activations in the backward — lets batch/patch sizes whose stored
        # activations exceed HBM train at the cost of ~one extra forward.
        # "s2d_stem": true|false|"auto"|"encoder"|"decoder" (our extension,
        # default "auto") runs the full-res levels in the space-to-depth
        # domain — numerically equivalent and checkpoint-identical
        # (ops/space_to_depth.py). "auto" resolves HERE from the measured
        # TRAIN table (s2d_auto_mode) on the per-chip batch: the model's own
        # "auto" gate is inference-profile and cannot see that the decoder
        # transform's transposes will be paid again in the backward.
        s2d_stem = cfg.get("s2d_stem", "auto")
        if s2d_stem == "auto":
            per_chip_batch = max(
                1, (self.batch_size * jax.process_count())
                // self.mesh.shape["data"])
            s2d_stem = s2d_auto_mode("train", per_chip_batch)
        elif s2d_stem not in ("encoder", "decoder"):
            s2d_stem = resolve_bool(s2d_stem)
        self.model = autoencoder_from_config(
            cfg["autoencoder_def"], compute_dtype=compute_dtype,
            use_pallas_attention=use_pallas_attention,
            remat=resolve_bool(cfg.get("remat", False)),
            norm_stats=str(cfg.get("norm_stats", DEFAULT_NORM_STATS)),
            s2d_stem=s2d_stem,
        )
        init_key, disc_key, self.run_key = jax.random.split(self.root_key, 3)
        dummy = jnp.zeros((1, *self.patch_size, 1), jnp.float32)
        params_g = jax.jit(self.model.init)(init_key, dummy, jax.random.key(0))

        self.disc = None
        params_d = None
        if self.adv_enabled:
            self.disc = PatchDiscriminator(
                spatial_dims=cfg.get("spatial_dims", 2),
                num_layers_d=3,
                channels=32,
                in_channels=1,
                out_channels=1,
                compute_dtype=compute_dtype,
            )
            params_d = jax.jit(self.disc.init)(disc_key, dummy)

        if self.tensor:
            # Channel-shard params over the model axis BEFORE building the
            # train state: optimizer init (zeros_like) inherits the layout,
            # so gradients/Adam moments shard too (parallel/tensor.py).
            from ..parallel.tensor import tensor_parallel_params

            params_g = tensor_parallel_params(self.mesh, params_g)
            if params_d is not None:
                params_d = tensor_parallel_params(self.mesh, params_d)

        self.state = create_train_state(
            params_g,
            lr=float(train_cfg["lr"]),
            world_size=self.world,
            params_d=params_d,
        )

        # ---- losses -------------------------------------------------------
        ar_spec = None
        if ar["enabled"]:
            mapping = filter_comment_keys(ar["block"].get("attribute_latent_mapping", {}))
            ar_spec = make_ar_vae_spec(
                mapping,
                pairwise_mode=ar["pairwise"],
                subset_pairs=ar["subset_pairs"],
                delta_global=ar["block"].get("delta_global"),
                latent_dim=cfg["autoencoder_def"]["latent_channels"],
            )
        self.lcfg = LossConfig(
            recon_loss=train_cfg.get("recon_loss", "l1"),
            kl_weight=float(train_cfg["kl_weight"]),
            perceptual_weight=float(train_cfg["perceptual_weight"]),
            adv_weight=float(train_cfg.get("adv_weight", 0.5)),
            ar_gamma=ar["gamma"],
            ar_vae_enabled=ar["enabled"],
            ar_spec=ar_spec,
            kl_mode=cfg.get("kl_mode", "reference"),
        )
        self.lpips_params = load_lpips_params()
        # Surface whether the perceptual loss is real LPIPS or the random-
        # feature fallback (VERDICT: no silent fallback) — in the W&B/run
        # config and in every metrics row via the logger.
        from ..models.lpips import lpips_is_pretrained

        self.perceptual_pretrained = lpips_is_pretrained(self.lpips_params)
        if self.rank == 0 and not self.perceptual_pretrained:
            print(
                "[WARN] perceptual loss uses RANDOM features (no converted "
                "LPIPS weights found) — see tools/convert_lpips_weights.py"
            )

        # ---- steps (one per GAN phase) -----------------------------------
        self._train_steps = {
            False: make_train_step(self.model, self.disc, self.lcfg, adv_active=False),
        }
        self._eval_steps = {
            False: make_eval_step(self.model, self.disc, self.lcfg, adv_active=False),
        }
        if self.adv_enabled:
            self._train_steps[True] = make_train_step(
                self.model, self.disc, self.lcfg, adv_active=True
            )
            self._eval_steps[True] = make_eval_step(
                self.model, self.disc, self.lcfg, adv_active=True
            )

        # ---- bookkeeping ---------------------------------------------------
        self.ckpt = CheckpointManager(str(self.model_dir))
        self.start_epoch = 0
        self.best_val_loss = 100.0
        self.total_step = 0
        if self.resume:
            import os

            ckpt_path = str(cfg.get("checkpoint_dir") or "")
            if ckpt_path and os.path.isfile(ckpt_path):
                # Reference full checkpoint (torch .pth): weights + Adam
                # moments + counters convert into this framework's state, so
                # a run started under the torch reference continues here.
                from ..checkpoint.reference_resume import load_reference_checkpoint

                self.state, meta = load_reference_checkpoint(
                    ckpt_path,
                    cfg["autoencoder_def"],
                    lr=float(train_cfg["lr"]),
                    world_size=self.world,
                    params_d_template=params_d,
                )
                if self.rank == 0:
                    print(f"[INFO] Resumed from reference checkpoint {ckpt_path} "
                          f"(epoch {meta['epoch']})")
            else:
                restored = self.ckpt.restore(self.state)
                if restored is None:
                    raise FileNotFoundError(f"No checkpoint to resume in {self.model_dir}")
                self.state, meta = restored
            self.start_epoch = meta["epoch"] + 1
            self.best_val_loss = meta["best_val_loss"]
            self.total_step = meta["total_step"]

        wandb_cfg = cfg.get("wandb") or {}
        if use_wandb is False:
            wandb_cfg = {**wandb_cfg, "enabled": False}
        run_config = init_wandb_config(cfg)
        run_config["perceptual_pretrained"] = self.perceptual_pretrained
        self.logger = MetricLogger(
            str(self.run_dir), rank=self.rank, wandb_cfg=wandb_cfg,
            run_config=run_config,
        )

    # -- helpers --------------------------------------------------------------
    def _device_batch(self, batch):
        arrays = {
            "image": batch["image"],
            "mask": batch["mask"],
            "attributes": {k: np.asarray(v) for k, v in batch.get("attributes", {}).items()},
        }
        placed = place_batch(self.mesh, arrays, spatial=self.spatial)
        return placed["image"], placed["mask"], placed["attributes"]

    def _adv_active(self, epoch: int) -> bool:
        return bool(self.adv_enabled and epoch > self.adv_warmup_epochs)

    # -- epochs -----------------------------------------------------------------
    def train_epoch(self, epoch: int) -> None:
        self.train_loader.set_epoch(epoch)
        step_fn = self._train_steps[self._adv_active(epoch)]
        # Metrics stay on device during the epoch (no per-step host sync —
        # float() every step would serialize dispatch); flushed after the
        # last batch with correct step numbering. The batch-0 debug print and
        # triplet dump are deferred the same way (device refs held, host
        # reads after the loop) so even step 0 doesn't block the pipeline.
        buffered: list[tuple[int, dict]] = []
        batch0: tuple[dict, Any] | None = None
        batch0_printed = False
        for step, batch in enumerate(self.train_loader):
            images, mask, attrs = self._device_batch(batch)
            self.run_key, step_key = jax.random.split(self.run_key)
            if self.trace_at_step is not None and self.total_step + 1 == self.trace_at_step:
                from ..utils.profiling import trace_if

                with trace_if(str(self.run_dir / "traces")):
                    self.state, metrics = step_fn(
                        self.state, images, mask, attrs, self.lpips_params, step_key
                    )
                    jax.block_until_ready(self.state.params_g)
                if self.rank == 0:
                    print(f"[INFO] profiler trace captured at step {self.total_step + 1} "
                          f"-> {self.run_dir / 'traces'}")
            else:
                self.state, metrics = step_fn(
                    self.state, images, mask, attrs, self.lpips_params, step_key
                )
            self.total_step += 1
            if self.rank == 0 and (step % self.log_every == 0):
                buffered.append((self.total_step, metrics))
            if step == 0 and self.rank == 0:
                # Hold only a device-side row-0 slice (not the full batch)
                # until after the loop; the host read happens there.
                batch0 = (metrics, first_row_refs(images))
            if batch0 is not None and not batch0_printed and step >= 2:
                # Emit the KL-explosion early warning with ~two steps of
                # pipeline slack (the host read waits only on batch 0's
                # already-finished compute) — NOT at end of epoch, where a
                # mid-epoch NaN/hang would swallow the stats the print
                # exists to surface.
                self._print_batch0_stats(batch0[0])
                batch0_printed = True
        if batch0 is not None:
            metrics0, img0_ref = batch0
            if not batch0_printed:  # epochs with < 3 batches
                self._print_batch0_stats(metrics0)
            img0 = first_row_read(img0_ref)
            # Train triplet panel for batch 0 (reference ``train_vae.py:479-493``).
            self._log_train_triplet(img0, epoch)
        for step_num, metrics in buffered:
            payload = {k: float(v) for k, v in metrics.items() if not k.startswith("debug/")}
            payload["train/step"] = step_num
            self.logger.log(payload, step=step_num)

    @staticmethod
    def _print_batch0_stats(metrics0: dict) -> None:
        """KL-explosion debug stats (reference ``train_vae.py:432-442``)."""
        print(
            f"[DEBUG] Train batch0 stats | z_mu mean={float(metrics0['debug/z_mu_mean']):.4f} | "
            f"z_sigma mean={float(metrics0['debug/z_sigma_mean']):.4f} | "
            f"kl_loss={float(metrics0['train/kl_loss']):.4f}"
        )

    def _log_train_triplet(self, img, epoch: int) -> None:
        """[original | reconstruction | diff] panel for the epoch's first
        image, rot90 k=3 display convention (reference ``train_vae.py:479-493``).
        Called after the epoch's dispatch loop (reconstruction uses
        end-of-epoch weights) so the host read never stalls training."""
        if not hasattr(self, "_triplet_infer"):
            from .steps import make_inference_fn

            self._triplet_infer = make_inference_fn(self.model)
        recon = np.asarray(self._triplet_infer(self.state.params_g, jnp.asarray(img)))
        img = np.asarray(img)
        diff = np.abs(img - recon)
        panels = np.concatenate([
            normalize_batch_for_display(img),
            normalize_batch_for_display(recon),
            normalize_batch_for_display(diff),
        ], axis=2)[0, :, :, 0]
        triplet = np.rot90(panels, k=3)
        self.logger.log_images("train/triplets", [(triplet * 255).astype(np.uint8)],
                               step=self.total_step)

    def validate(self, epoch: int) -> float:
        """Returns epoch-mean reconstruction loss (the best-model criterion,
        reference ``validate`` -> ``val_recon_epoch_loss``)."""
        eval_fn = self._eval_steps[self._adv_active(epoch)]
        # Metric sums accumulate ON DEVICE (tiny adds, dispatched async);
        # float() per metric per batch would serialize dispatch exactly the
        # way the train loop avoids. One host transfer after the loop.
        sums: dict[str, jnp.ndarray] | None = None
        n_batches = 0
        start_epoch_to_save, save_every = 10, 5
        do_save_images = (
            self.rank == 0 and epoch >= start_epoch_to_save and epoch % save_every == 0
        )
        if do_save_images:
            epoch_dir = self.run_dir / "validation_samples" / f"epoch_{epoch}"
            for sub in ("originale", "reconstruction", "diff"):
                (epoch_dir / sub).mkdir(parents=True, exist_ok=True)

        dumps: list[tuple[int, Any, Any]] = []
        for step, batch in enumerate(self.val_loader):
            images, mask, attrs = self._device_batch(batch)
            self.run_key, step_key = jax.random.split(self.run_key)
            metrics, recon = eval_fn(
                self.state, images, mask, attrs, self.lpips_params, step_key
            )
            sums = metrics if sums is None else jax.tree.map(jnp.add, sums, metrics)
            n_batches += 1

            if do_save_images:
                # Bank non-blocking device-side row-0 handles; the host
                # copies and TIF IO happen after the loop so neither ever
                # blocks the next eval dispatch.
                dumps.append((step, first_row_refs(images), first_row_refs(recon)))

        for step, img_ref, rec_ref in dumps:
            img = first_row_read(img_ref)[0, :, :, 0]
            rec = first_row_read(rec_ref)[0, :, :, 0]
            diff = np.abs(img - rec)
            # rot90 k=3 display convention (reference ``train_vae.py:616-618``)
            epoch_dir = self.run_dir / "validation_samples" / f"epoch_{epoch}"
            write_tif(str(epoch_dir / "originale" / f"step{step:03}.tif"), np.rot90(img, k=3))
            write_tif(
                str(epoch_dir / "reconstruction" / f"step{step:03}.tif"), np.rot90(rec, k=3)
            )
            write_tif(str(epoch_dir / "diff" / f"step{step:03}.tif"), np.rot90(diff, k=3))

        means = {k: float(v) / max(n_batches, 1) for k, v in (sums or {}).items()}
        val_total = compute_total_loss(
            means.get("recon_loss", 0.0),
            means.get("kl_loss", 0.0),
            means.get("perceptual_loss", 0.0),
            means.get("adv_gen_loss", 0.0),
            means.get("ar_loss", 0.0),
            kl_weight=self.lcfg.kl_weight,
            perceptual_weight=self.lcfg.perceptual_weight,
            adv_weight=self.lcfg.adv_weight,
            ar_gamma=self.lcfg.ar_gamma,
            ar_vae_enabled=self.lcfg.ar_vae_enabled,
        )
        if self.rank == 0:
            payload = {
                "val/recon_loss": means.get("recon_loss", 0.0),
                "val/kl_loss": means.get("kl_loss", 0.0),
                "val/perceptual_loss": means.get("perceptual_loss", 0.0),
                "val/adv_gen_loss": self.lcfg.adv_weight * means.get("adv_gen_loss", 0.0)
                if self.adv_enabled else 0.0,
                "val/adv_disc_loss": self.lcfg.adv_weight * means.get("adv_disc_loss", 0.0)
                if self.adv_enabled else 0.0,
                "val/loss_total": float(val_total),
                "epoch": epoch,
            }
            if self.lcfg.ar_vae_enabled:
                payload["val/ar_loss_total"] = means.get("ar_loss", 0.0)
                for key, val in means.items():
                    if key.startswith("ar_loss_"):
                        payload[f"val/{key}"] = val
            self.logger.log(payload)
        return means.get("recon_loss", 0.0)

    # -- main loop -------------------------------------------------------------
    def train(self) -> dict[str, Any]:
        for epoch in range(self.start_epoch, self.max_epochs):
            start_time = time.time()
            self.train_epoch(epoch)
            if epoch % self.val_interval == 0:
                val_loss = self.validate(epoch)
                if self.rank == 0:
                    elapsed = time.time() - start_time
                    print(f"Epoch {epoch} val_loss: {val_loss:.4f} | Time: {elapsed:.1f}s")
                    self.logger.log({"time_per_epoch": elapsed, "epoch": epoch})
                    # One device->host fetch for last+best combined, disk
                    # writes on the checkpoint manager's background thread —
                    # the next epoch starts dispatching immediately.
                    self.best_val_loss = self.ckpt.save_epoch(
                        state=self.state,
                        epoch=epoch,
                        val_loss=val_loss,
                        best_val_loss=self.best_val_loss,
                        total_step=self.total_step,
                    )
        if self.rank == 0:
            self.ckpt.wait()
        self.logger.finish()
        return {"best_val_loss": self.best_val_loss, "total_step": self.total_step}
