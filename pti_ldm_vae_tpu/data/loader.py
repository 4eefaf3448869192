"""Host data pipeline: parallel decode/transform, RAM cache, sharding, prefetch.

TPU-first redesign of the reference's MONAI ``DataLoader``/``CacheDataset``/
``DistributedSampler`` stack (``dataloaders.py:517-587``):

* thread-pool image decode + numpy preprocessing (the GIL is released inside
  PIL/numpy, so threads ≈ MONAI's worker processes without pickling overhead),
* optional RAM cache of *transformed* samples (``cache_rate`` semantics:
  first fraction of the dataset cached; val loaders cache everything,
  reference ``dataloaders.py:517-529``),
* per-host sharding with DistributedSampler semantics (pad-by-wrapping so all
  hosts see the same step count; ``rank::world`` interleave) — the
  ``jax.process_index()`` equivalent of ``dataloaders.py:542-570``,
* **static batch shapes**: the final partial batch is zero-padded to
  ``batch_size`` with a per-sample validity mask, so the jitted train step
  never retraces (the reference instead ships a smaller last batch — fine for
  eager torch, a recompile for XLA),
* background prefetch (depth 2) to overlap host IO with device compute.

Batches are numpy dicts: ``{"image": [B,H,W,1] f32, "mask": [B] f32,
"attributes": {name: [B] f32}?}``. Device placement is the trainer's job.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

from .io import read_image
from .transforms import preprocess_image_np

__all__ = ["ShardedDataLoader", "shard_indices"]


def shard_indices(
    n: int, *, rank: int = 0, world: int = 1, shuffle: bool = False,
    seed: int = 0, epoch: int = 0,
) -> np.ndarray:
    """DistributedSampler-equivalent index schedule (``dataloaders.py:542-550``):
    optional per-epoch seeded shuffle, pad by wrapping to a multiple of
    ``world``, then interleave ``rank::world``."""
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    else:
        order = np.arange(n)
    total = -(-n // world) * world
    if total > n:
        order = np.concatenate([order, order[: total - n]])
    return order[rank::world]


class ShardedDataLoader:
    """Iterable over preprocessed, statically-shaped batches."""

    def __init__(
        self,
        paths: list[str],
        patch_size: tuple[int, int],
        batch_size: int,
        *,
        attributes: list[dict[str, float]] | None = None,
        shuffle: bool = False,
        seed: int = 42,
        rank: int = 0,
        world: int = 1,
        cache_rate: float = 0.0,
        num_workers: int = 8,
        pad_last: bool = True,
        drop_last: bool = False,
        transform=None,
    ):
        if attributes is not None and len(attributes) != len(paths):
            raise ValueError("attributes must align with paths")
        if not 0.0 <= cache_rate <= 1.0:
            raise ValueError(f"cache_rate must be in [0, 1], got {cache_rate}")
        self.paths = list(paths)
        self.patch_size = tuple(patch_size)
        self.batch_size = int(batch_size)
        self.attributes = attributes
        self.shuffle = shuffle
        self.seed = seed if seed is not None else 0
        self.rank = rank
        self.world = world
        self.cache_rate = cache_rate
        self.num_workers = max(1, num_workers)
        self.pad_last = pad_last
        self.drop_last = drop_last
        self.epoch = 0
        self._transform = transform or self._default_transform
        self._cache: dict[int, np.ndarray] = {}
        self._cache_limit = int(cache_rate * len(self.paths))
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def _default_transform(self, path: str) -> np.ndarray:
        """Canonical preprocessing: native C++ fused decode+resize+normalize
        when the library handles the file (uncompressed grayscale TIFF),
        else the bit-compatible Python path."""
        if str(path).lower().endswith((".tif", ".tiff")):
            from .. import native

            result = native.preprocess_tiff(str(path), self.patch_size)
            if result is not None:
                return result
        return preprocess_image_np(read_image(path), self.patch_size)

    def set_epoch(self, epoch: int) -> None:
        """Reference ``train_loader.sampler.set_epoch`` parity
        (``train_vae.py:373-374``)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(shard_indices(len(self.paths), rank=self.rank, world=self.world))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _sample(self, idx: int) -> np.ndarray:
        if idx in self._cache:
            return self._cache[idx]
        img = self._transform(self.paths[idx])
        if idx < self._cache_limit:
            self._cache[idx] = img
        return img

    def _make_batch(self, idx_chunk: np.ndarray) -> dict[str, Any]:
        images = list(self._pool.map(self._sample, [int(i) for i in idx_chunk]))
        valid = len(images)
        bsz = self.batch_size if self.pad_last else valid
        h, w = self.patch_size
        batch = np.zeros((bsz, h, w, images[0].shape[-1]), dtype=np.float32)
        mask = np.zeros((bsz,), dtype=np.float32)
        for i, img in enumerate(images):
            batch[i] = img
            mask[i] = 1.0
        out: dict[str, Any] = {"image": batch, "mask": mask}
        if self.attributes is not None:
            keys = self.attributes[0].keys()
            out["attributes"] = {
                key: np.array(
                    [float(self.attributes[int(i)][key]) for i in idx_chunk]
                    + [0.0] * (bsz - valid),
                    dtype=np.float32,
                )
                for key in keys
            }
        return out

    def _batches(self) -> Iterator[dict[str, Any]]:
        idx = shard_indices(
            len(self.paths),
            rank=self.rank,
            world=self.world,
            shuffle=self.shuffle,
            seed=self.seed,
            epoch=self.epoch,
        )
        n_full = len(idx) // self.batch_size
        end = n_full * self.batch_size
        for start in range(0, end, self.batch_size):
            yield self._make_batch(idx[start : start + self.batch_size])
        if not self.drop_last and end < len(idx):
            yield self._make_batch(idx[end:])

    def __iter__(self) -> Iterator[dict[str, Any]]:
        """Iterate with a depth-2 background prefetch."""
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        error: list[BaseException] = []

        def producer():
            try:
                for batch in self._batches():
                    q.put(batch)
            except BaseException as exc:  # surfaced in the consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
