"""Training observability: per-step metric history + stdout prints.

The reference appends loss/psnr floats to in-memory dicts and saves them as
``log.npy`` (siren/train_img.py:69,90-91,109-111) or inside GAN checkpoints as
``loss_log`` (pi_GAN/train.py:76,120,136).  We keep those artifacts for
tooling parity and add wall-clock step timing (the reference has no profiling
at all — SURVEY.md §5).
"""

from __future__ import annotations

import os
import time

import numpy as np


class MetricLogger:
    def __init__(self, keys):
        self.data = {k: [] for k in keys}
        self._t0 = time.perf_counter()
        self._last = self._t0

    def append(self, **kv):
        for k, v in kv.items():
            self.data[k].append(float(v))

    def step_time(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        return dt

    def save(self, log_path: str, name: str = "log.npy") -> str:
        os.makedirs(log_path, exist_ok=True)
        path = os.path.join(log_path, name)
        np.save(path, self.data)  # same format as the reference's log.npy
        return path

    @staticmethod
    def load(path: str) -> dict:
        return np.load(path, allow_pickle=True).item()


def log_print(msg: str):
    print(msg, flush=True)
