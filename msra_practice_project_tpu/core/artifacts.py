"""Restart-durable artifact root for long runs.

Host restarts on this machine wipe BOTH /tmp and ~/.cache (observed
2026-08-18: the 100k pi-GAN flagship died at ~30k because its experiment
dir lived in /tmp — BASELINE.md "RUN LOST" row).  Only the repo tree
survives.  The reference's recovery mechanism (resume by scanning the log
dir, nerf/train_nerf.py:101-114) is useless if the dir itself is gone, so
every long-running tool must put checkpoints, logs, and sample grids under
a durable root by default.

``durable_root()`` resolves, in order:
  1. ``MSRA_TPU_RUN_ROOT`` env var (explicit override),
  2. ``<repo>/runs`` — the directory containing this package (gitignored;
     survives host restarts because the repo volume does).

``run_dir(name)`` returns (and creates) a subdirectory for one experiment
family, e.g. ``run_dir("pigan_validate")``.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def durable_root() -> str:
    root = os.environ.get("MSRA_TPU_RUN_ROOT") or \
        os.path.join(_REPO_ROOT, "runs")
    os.makedirs(root, exist_ok=True)
    return root


def run_dir(name: str) -> str:
    path = os.path.join(durable_root(), name)
    os.makedirs(path, exist_ok=True)
    return path
