"""Shared helpers for NeRF eval scripts: experiment reload + view rendering."""

from __future__ import annotations

import os

import jax
import numpy as np

from ..core import ckpt as ckpt_lib
from ..core.config import NERF_TRAIN_DEFAULTS, load_config, resolve
from ..models.nerf import nerf_model
from ..ops.render import render_image, render_image_sharded
from ..parallel import mesh as mesh_lib
from ..train import common


def load_experiment(log_path: str, ckpt_idx: int | None = None):
    """Re-read the resolved config written at train time
    (ref: nerf/test_nerf.py:16-21) and restore the requested checkpoint."""
    config = resolve(load_config(os.path.join(log_path, "config.json")),
                     NERF_TRAIN_DEFAULTS)
    coarse_model = nerf_model(config["use_siren"])
    fine_model = nerf_model(config["use_siren"])
    key = jax.random.PRNGKey(config.get("seed", 0))
    params = {
        "coarse": coarse_model.init(jax.random.fold_in(key, 1)),
        "fine": (fine_model.init(jax.random.fold_in(key, 2))
                 if config["use_fine_model"] else None),
    }
    tx = common.adam(common.exponential_lr(config["learning_rate"],
                                           config["learning_rate_decay"]))
    template = common.init_state(params, tx)
    if ckpt_idx is not None:
        state = ckpt_lib.restore(ckpt_lib.ckpt_path(log_path, ckpt_idx),
                                 template)
        step = ckpt_idx
    else:
        found = ckpt_lib.restore_latest(log_path, template)
        if found is None:
            raise FileNotFoundError(f"no checkpoint under {log_path}")
        step, state = found
    return config, (coarse_model, fine_model), state, step


def model_fns(config, models, state):
    coarse_model, fine_model = models
    params = state["params"]
    coarse_fn = jax.tree_util.Partial(coarse_model.apply, params["coarse"])
    fine_fn = (jax.tree_util.Partial(fine_model.apply, params["fine"])
               if config["use_fine_model"] else coarse_fn)
    return coarse_fn, fine_fn


_EVAL_MESH = None


def _eval_mesh():
    """One shared 1-D mesh over all devices for eval renders (None if the
    host has a single device — the common TPU-v5e-1 case)."""
    global _EVAL_MESH
    if _EVAL_MESH is None and len(jax.devices()) > 1:
        _EVAL_MESH = mesh_lib.make_mesh()
    return _EVAL_MESH


def render_view(config, models, state, width, height, focal, pose, key,
                sample_mult: float = 1.0, chunk: int = 16384):
    """Render one full frame; on a multi-chip host the ray tiles shard over
    all devices automatically (render_image_sharded == render_image,
    equality-tested in tests/test_parallel.py)."""
    coarse_fn, fine_fn = model_fns(config, models, state)
    nc = int(sample_mult * config["render_coarse_sample_num"])
    nf = int(sample_mult * config["render_fine_sample_num"])
    mesh = _eval_mesh()
    if mesh is not None:
        rgb, depth, acc = render_image_sharded(
            key, width, height, focal, pose, config["render_near"],
            config["render_far"], coarse_fn, fine_fn, nc, nf, mesh=mesh,
            chunk=chunk)
    else:
        rgb, depth, acc = render_image(
            key, width, height, focal, pose, config["render_near"],
            config["render_far"], coarse_fn, fine_fn, nc, nf, chunk=chunk)
    return np.asarray(rgb), np.asarray(depth), np.asarray(acc)
