"""Persistent XLA compilation cache for every framework entry point.

The remote TPU compiler behind the axon tunnel costs 20-350 s per jitted
graph, paid again by every process (each validate/eval/bench run recompiles
the same render and train steps).  JAX's persistent compilation cache
replays an identical compile from disk — measured 345 s -> 4.4 s for a
deep matmul chain through the tunnel.

Enabled automatically when the package is imported; opt out with
``MSRA_TPU_COMPILE_CACHE=0``, relocate with ``MSRA_TPU_COMPILE_CACHE_DIR``.
A user-level ``JAX_COMPILATION_CACHE_DIR`` env setting wins — we never
override an explicit JAX configuration.
"""

from __future__ import annotations

import os

# Under the durable run root (default <repo>/runs/.xla_cache), NOT ~/.cache:
# host restarts wipe ~/.cache (observed 2026-08-18 — every entry point went
# back to 20-350 s cold compiles), while the repo volume survives.
from msra_practice_project_tpu.core.artifacts import durable_root

_LEGACY_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "msra_tpu_xla_cache")


def _default_dir() -> str:
    return os.path.join(durable_root(), ".xla_cache")

# Only persist compiles that cost real time; keeps the tiny always-changing
# test graphs (CPU backend, random shapes) from churning the cache.
_MIN_COMPILE_SECS = 5.0


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent cache.  Returns True if active."""
    if os.environ.get("MSRA_TPU_COMPILE_CACHE", "1") == "0":
        return False
    # CPU-pinned runs (tests, the multichip dryrun re-exec) skip the cache:
    # the remote-compiler latency it solves doesn't exist there, and XLA:CPU
    # AOT entries embed host machine features — replaying one on a different
    # host warns about feature mismatch and can SIGILL.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith("cpu"):
        return False
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return True  # user already configured jax's own knob
    path = (cache_dir or os.environ.get("MSRA_TPU_COMPILE_CACHE_DIR")
            or _default_dir())
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        _adopt_legacy_entries(path)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          _MIN_COMPILE_SECS)
    except Exception:
        return False
    return True


def _adopt_legacy_entries(path: str) -> None:
    """One-time migration: hard-link any surviving ~/.cache entries into the
    durable dir so a warm cache isn't thrown away by the relocation.  When
    ~/.cache and the repo live on different filesystems os.link raises EXDEV
    — fall back to a real copy so the migration still happens (ADVICE r4)."""
    try:
        if not os.path.isdir(_LEGACY_DIR):
            return
        for name in os.listdir(_LEGACY_DIR):
            src, dst = os.path.join(_LEGACY_DIR, name), os.path.join(path, name)
            if not os.path.exists(dst):
                try:
                    os.link(src, dst)
                except OSError:
                    try:
                        import shutil

                        shutil.copy2(src, dst)
                    except OSError:
                        pass
    except OSError:
        pass
