"""Flat-directory image dataset for pi-GAN training.

Re-design of pi_GAN/dataloader.py:9-73.  Same contract: `get()` returns
(epoch_idx, batch_idx, batch [B, H, W, 3] float in [0,1]); per-epoch shuffle;
`keep_full` drops the ragged tail batch.  `preload=True` decodes everything
once and keeps the whole dataset as one device array (the datasets involved —
64x64 crops — fit trivially in HBM, so preload is the default here, unlike
the reference where it competed with the model for GPU memory).

For datasets that do NOT fit in HBM, `preload=False` streams batches; with
`prefetch=True` (default) a worker thread decodes and stages batch k+1 while
the device trains on batch k, so PIL decode never sits on the step's critical
path (the reference decodes synchronously inside `get()`,
pi_GAN/dataloader.py:62-66).  The (epoch, batch, contents) sequence is
identical with and without prefetch.
"""

from __future__ import annotations

import os
import queue
import threading

import jax.numpy as jnp
import numpy as np
from PIL import Image


class ImageFolder:
    def __init__(self, data_path: str, batch_size: int, resize: float = 1.0,
                 preload: bool = True, keep_full: bool = True, seed: int = 0,
                 prefetch: bool = True, prefetch_depth: int = 2):
        self.data_path = data_path
        self.batch_size = batch_size
        self.resize = resize
        self.preload = preload
        self.keep_full = keep_full
        self.files = sorted(
            os.path.join(data_path, f) for f in os.listdir(data_path)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not self.files:
            raise ValueError(f"no images found under {data_path}")
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(len(self.files))
        self._rng.shuffle(self._order)
        self.epoch_idx = 0
        self.batch_idx = 0
        n = len(self.files)
        self.batch_num = n // batch_size if keep_full else -(-n // batch_size)
        self.batch_num = max(self.batch_num, 1)
        self._cache = None
        self._queue = None
        self._worker = None
        self._stop = threading.Event()
        if preload:
            self._cache = jnp.asarray(
                np.stack([self._read(f) for f in self.files]))
        elif prefetch:
            self._queue = queue.Queue(maxsize=max(1, prefetch_depth))
            self._worker = threading.Thread(target=self._produce, daemon=True)
            self._worker.start()

    def _read(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        if self.resize != 1:
            img = img.resize((int(self.resize * img.width),
                              int(self.resize * img.height)), Image.LANCZOS)
        return np.array(img, dtype=np.float32) / 255.0

    def __len__(self):
        return len(self.files)

    def _next_indices(self):
        """Advance the (epoch, batch, file-index) cursor — the single source
        of batch order for both the sync and the prefetch path."""
        lo = self.batch_idx * self.batch_size
        hi = min(lo + self.batch_size, len(self.files))
        idx = self._order[lo:hi].copy()
        out = (self.epoch_idx, self.batch_idx, idx)
        self.batch_idx += 1
        if self.batch_idx >= self.batch_num:
            self.batch_idx = 0
            self.epoch_idx += 1
            self._rng.shuffle(self._order)
        return out

    def _produce(self):
        while not self._stop.is_set():
            epoch, bidx, idx = self._next_indices()
            stack = np.stack([self._read(self.files[i]) for i in idx])
            while not self._stop.is_set():
                try:
                    self._queue.put((epoch, bidx, stack), timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Stop the prefetch worker (no-op otherwise)."""
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=5.0)
            self._worker = None

    def get(self):
        """(epoch_idx, batch_idx, images [B, H, W, 3] device array)."""
        if self._queue is not None:
            epoch, bidx, stack = self._queue.get()
            return epoch, bidx, jnp.asarray(stack)
        epoch, bidx, idx = self._next_indices()
        if self._cache is not None:
            batch = self._cache[jnp.asarray(idx)]
        else:
            batch = jnp.asarray(np.stack([self._read(self.files[i])
                                          for i in idx]))
        return epoch, bidx, batch


def make_synthetic_faces(tmp_dir: str, n: int = 32, size: int = 64, seed=0):
    """Tiny stand-in for the CelebA-style 64x64 crops (tests/smoke runs)."""
    rng = np.random.default_rng(seed)
    os.makedirs(tmp_dir, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size] / (size - 1)
    for i in range(n):
        cx, cy = rng.uniform(0.3, 0.7, 2)
        r = rng.uniform(0.15, 0.3)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r**2)))
        col = rng.uniform(0.2, 1.0, 3)
        img = (blob[..., None] * col + (1 - blob[..., None]) * 0.9)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(tmp_dir, f"{i:05d}.png"))
    return tmp_dir
