"""Checkpointing: step-stamped pytree snapshots with idempotent scan-resume.

The reference saves `torch.save` dicts named ``{step:06d}.tar`` at fixed
intervals and auto-resumes by scanning the log dir for the latest such file
(nerf/train_nerf.py:101-114,181-189; pi_GAN/train.py:62-77,162-172).  We keep
the identical recovery mechanism — restart the process, it picks up the newest
snapshot — but serialise JAX pytrees via flax.serialization msgpack bytes.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
from flax import serialization

CKPT_SUFFIX = ".ckpt"
_STEP_RE = re.compile(r"^(\d{6,})" + re.escape(CKPT_SUFFIX) + r"$")


def ckpt_path(log_path: str, step: int) -> str:
    return os.path.join(log_path, f"{step:06d}{CKPT_SUFFIX}")


def save(log_path: str, step: int, state: Any) -> str:
    """Serialise `state` (any pytree) to <log_path>/<step:06d>.ckpt."""
    os.makedirs(log_path, exist_ok=True)
    state = jax.device_get(state)
    path = ckpt_path(log_path, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
        f.flush()
        os.fsync(f.fileno())  # durable before publish: rename-only atomicity
        # holds for process kills, not power/OS crashes
    os.replace(tmp, path)  # atomic publish so a crash never leaves a torn ckpt
    return path


def list_checkpoints(log_path: str) -> list[tuple[int, str]]:
    """All (step, path) snapshots in ascending step order."""
    if not os.path.isdir(log_path):
        return []
    out = []
    for f in os.listdir(log_path):
        m = _STEP_RE.match(f)
        if m:
            out.append((int(m.group(1)), os.path.join(log_path, f)))
    return sorted(out)


def latest(log_path: str) -> tuple[int, str] | None:
    cks = list_checkpoints(log_path)
    return cks[-1] if cks else None


def restore(path: str, target: Any) -> Any:
    """Restore a snapshot into the structure of `target` (a template pytree)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def restore_latest(log_path: str, target: Any) -> tuple[int, Any] | None:
    """Resume-by-scan: load the newest readable snapshot.

    Falls back to older snapshots when the newest fails to deserialise
    (e.g. torn by a power/OS crash mid-write): a supervised auto-restart
    must not wedge forever on one corrupt file while valid snapshots sit
    next to it."""
    cks = list_checkpoints(log_path)
    for step, path in reversed(cks):
        try:
            return step, restore(path, target)
        except Exception as e:  # torn msgpack, truncated file, ...
            print(f"[ckpt] {path} unreadable ({type(e).__name__}: {e}); "
                  "falling back to the previous snapshot")
    return None
