"""Shared trainer plumbing: train state, optimizers, resume, CLI glue.

Every driver is `python -m msra_practice_project_tpu.train.<name>
<config.json> [key=value ...]` — same UX as the reference's
`python <script>.py <config.json>`, plus optional overrides for smoke runs.
"""

from __future__ import annotations

import json
import sys

import jax
import optax

from ..core import ckpt as ckpt_lib
from ..core.config import load_config, resolve


def exponential_lr(base_lr: float, decay_thousands: float,
                   decay_rate: float = 0.1):
    """lr * rate^(step / (decay_thousands * 1000)) — the reference's manual
    per-step decay (nerf/train_nerf.py:170-176)."""
    def schedule(step):
        return base_lr * decay_rate ** (step / (decay_thousands * 1000.0))
    return schedule


def interp_lr(lr0: float, lr_end: float, decay_thousands: float,
              decay_rate: float = 0.1):
    """lr_end + (lr0 - lr_end) * rate^(step/steps) — the pi-GAN dual decay
    (pi_GAN/train.py:138-147)."""
    def schedule(step):
        return lr_end + (lr0 - lr_end) * decay_rate ** (
            step / (decay_thousands * 1000.0))
    return schedule


def adam(learning_rate, betas=(0.9, 0.999)):
    """Adam; a float lr is wrapped in a constant schedule so the optimizer
    state pytree has the same structure whether or not a decay schedule is
    used (keeps checkpoints interchangeable across drivers)."""
    if not callable(learning_rate):
        lr_value = float(learning_rate)
        def learning_rate(step):  # noqa: F811 - constant schedule
            return lr_value
    return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=1e-8)


def init_state(params, tx) -> dict:
    return {"params": params, "opt_state": tx.init(params), "step": 0}


def resume(log_path: str, state: dict) -> tuple[int, dict]:
    """Scan-resume: returns (global_step, state) — 0 and the fresh state when
    no checkpoint exists (ref behaviour: nerf/train_nerf.py:100-114)."""
    found = ckpt_lib.restore_latest(log_path, state)
    if found is None:
        return 0, state
    step, restored = found
    print(f"Reloading from {ckpt_lib.ckpt_path(log_path, step)}")
    return step, restored


def parse_cli(argv, defaults: dict) -> Config:
    """argv = [config.json, k=v, ...] -> resolved Config."""
    if not argv:
        print("usage: ... <config.json> [key=value ...]", file=sys.stderr)
        raise SystemExit(2)
    cfg = resolve(load_config(argv[0]), defaults)
    for kv in argv[1:]:
        k, v = kv.split("=", 1)
        try:
            cfg[k] = json.loads(v)
        except json.JSONDecodeError:
            cfg[k] = v
    return cfg


def summary_module(name: str, params) -> int:
    """Print total parameter count (ref: pi_GAN/utils.py:14-20)."""
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{name}: {n:,} total parameters.")
    return n
