"""Flat-directory image dataset for pi-GAN training.

Re-design of pi_GAN/dataloader.py:9-73.  Same contract: `get()` returns
(epoch_idx, batch_idx, batch [B, H, W, 3] float in [0,1]); per-epoch shuffle;
`keep_full` drops the ragged tail batch.  `preload=True` decodes everything
once and keeps the whole dataset as one device array (the datasets involved —
64x64 crops — fit trivially in HBM, so preload is the default here, unlike
the reference where it competed with the model for GPU memory).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


class ImageFolder:
    def __init__(self, data_path: str, batch_size: int, resize: float = 1.0,
                 preload: bool = True, keep_full: bool = True, seed: int = 0):
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
        if preload:
            self._cache = jnp.asarray(
                np.stack([self._read(f) for f in self.files]))

    def _read(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        if self.resize != 1:
            img = img.resize((int(self.resize * img.width),
                              int(self.resize * img.height)), Image.LANCZOS)
        return np.array(img, dtype=np.float32) / 255.0

    def __len__(self):
        return len(self.files)

    def get(self):
        """(epoch_idx, batch_idx, images [B, H, W, 3] device array)."""
        lo = self.batch_idx * self.batch_size
        hi = min(lo + self.batch_size, len(self.files))
        idx = self._order[lo:hi]
        if self._cache is not None:
            batch = self._cache[jnp.asarray(idx)]
        else:
            batch = jnp.asarray(np.stack([self._read(self.files[i])
                                          for i in idx]))
        out = (self.epoch_idx, self.batch_idx, batch)
        self.batch_idx += 1
        if self.batch_idx >= self.batch_num:
            self.batch_idx = 0
            self.epoch_idx += 1
            self._rng.shuffle(self._order)
        return out


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
