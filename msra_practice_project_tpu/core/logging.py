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
    """Appends are LAZY: device scalars are stored as-is and only converted
    to python floats in batches (at print/save cadence).  Converting every
    step would force a host<->device sync per step — ~35 ms of round-trip
    latency per step through the TPU tunnel, more than the step itself.

    The batch conversion itself is ONE device concatenation + ONE transfer
    per key (a `float(v)` per pending scalar would pay the ~28 ms round-trip
    per VALUE — measured 22 s for a 400-step run's log).  Multi-step trainers
    should append each scan chunk's [K] metric vector with `append_vec`
    rather than indexing it into K scalars (each index is its own dispatch).
    """

    def __init__(self, keys):
        self._data = {k: [] for k in keys}
        self._flushed = {k: 0 for k in keys}   # prefix already python floats
        self._pending = 0
        self._t0 = time.perf_counter()
        self._last = self._t0

    def preload(self, data: dict, n: int | None = None):
        """Seed history from a saved log (resume): keeps the first `n`
        entries per key (all when n is None) so the merged log spans the
        whole run, not just the post-resume segment."""
        for k in self._data:
            vs = [float(x) for x in data.get(k, [])]
            self._data[k] = vs if n is None else vs[:n]
            self._flushed[k] = len(self._data[k])

    def append(self, **kv):
        """One entry per key: a scalar (device scalar or python float) or a
        [K] per-step metric vector covering K steps — flush() flattens
        both into the scalar history."""
        for k, v in kv.items():
            self._data[k].append(v)
        self._pending += 1

    # alias kept for call-site readability (vector-entry intent)
    append_vec = append

    def flush(self):
        if not self._pending:
            return
        import jax.numpy as jnp

        for k, vs in self._data.items():
            start = self._flushed[k]
            pend = vs[start:]
            if not pend:
                continue
            parts = [jnp.atleast_1d(jnp.asarray(v, jnp.float32))
                     for v in pend]
            flat = np.asarray(parts[0] if len(parts) == 1
                              else jnp.concatenate(parts))
            self._data[k] = vs[:start] + [float(x) for x in flat]
            self._flushed[k] = len(self._data[k])
        self._pending = 0

    @property
    def data(self) -> dict:
        self.flush()
        return self._data

    def step_time(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        return dt

    def save(self, log_path: str, name: str = "log.npy") -> str:
        self.flush()
        os.makedirs(log_path, exist_ok=True)
        path = os.path.join(log_path, name)
        np.save(path, self._data)  # same format as the reference's log.npy
        return path

    @staticmethod
    def load(path: str) -> dict:
        return np.load(path, allow_pickle=True).item()


def flush_scalar_list(vs: list) -> list:
    """Convert a float-prefix + pending-device-scalar list to all floats in
    ONE device concatenation + ONE transfer (a `float(v)` per value pays the
    ~28 ms tunnel round-trip per VALUE).  Entries may be python floats,
    device scalars, or [K] per-scan-chunk vectors; vectors flatten in order.
    """
    import jax.numpy as jnp

    start = next((i for i, v in enumerate(vs) if not isinstance(v, float)),
                 len(vs))
    pend = vs[start:]
    if not pend:
        return vs
    parts = [jnp.atleast_1d(jnp.asarray(v, jnp.float32)) for v in pend]
    flat = np.asarray(parts[0] if len(parts) == 1 else jnp.concatenate(parts))
    return vs[:start] + [float(x) for x in flat]


def log_print(msg: str):
    print(msg, flush=True)
