"""Config system.

The reference drives every experiment from a raw JSON file parsed by hand with
``config['k'] if 'k' in config else default`` in each script (e.g.
nerf/train_nerf.py:14-45).  We keep the exact same JSON key names and defaults
so the reference's 49 config files load verbatim, but centralise parsing in a
small typed wrapper, and keep the reference's reproducibility mechanism of
writing the *resolved* config back into the log directory
(nerf/train_nerf.py:55-59, re-read by nerf/test_nerf.py:16-21).
"""

from __future__ import annotations

import json
import os
from typing import Any


class Config(dict):
    """A dict with attribute access and defaulting `.get`."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        return Config(json.load(f))


def save_config(config: dict, log_path: str, name: str = "config.json") -> str:
    """Write the resolved config back into the experiment log directory."""
    os.makedirs(log_path, exist_ok=True)
    out = os.path.join(log_path, name)
    with open(out, "w") as f:
        json.dump(dict(config), f, indent=2)
    return out


def log_dir(config: dict) -> str:
    return os.path.join(config["output_path"], config["experiment_name"])


# Per-workload default tables (key name -> default), mirroring the reference
# drivers line-for-line so both frameworks resolve identical hyperparameters.

NERF_TRAIN_DEFAULTS = {
    # nerf/train_nerf.py:21-45
    "data_resize": 0.5,
    "data_skip": 8,
    "data_train_idx": None,
    "data_view_dir_range": None,
    "data_view_dir_noise": None,
    "data_target_num": None,
    "data_show_distribution": False,
    "render_near": 2.0,
    "render_far": 6.0,
    "render_coarse_sample_num": 64,
    "render_fine_sample_num": 128,
    "iterations": 200000,
    "batch_size": 1024,
    "learning_rate": 5e-4,
    "learning_rate_decay": 500,
    "start_up_itrs": 500,
    "use_fine_model": True,
    "use_alpha": False,
    "use_siren": False,
    # TPU-native addition: route MLP eval through the fused Pallas kernel
    # (ops/pallas/nerf_mlp.py) when training the PE NeRF on TPU.
    "use_fused_mlp": True,
    # TPU-native addition: steps dispatched per XLA call (lax.scan) — the
    # measured-best configuration (BASELINE.md: ~1.2 ms/dispatch amortised);
    # cadence/epoch/startup boundaries are respected, so prints/saves/
    # renders land on identical steps as steps_per_call=1.
    "steps_per_call": 10,
    "i_print": 100,
    "i_save": 10000,
    "i_image": 1000,
}

SIREN_IMG_DEFAULTS = {
    # siren/train_img.py:22-29
    "iterations": 10000,
    "batch_size": 65536,
    "learning_rate": 1e-4,
    "model_type": "siren",
    "i_print": 100,
    "i_save": 10000,
    "i_image": 1000,
}

SIREN_SDF_DEFAULTS = {
    # siren/train_sdf.py:22-29
    "iterations": 10000,
    "batch_size": 65536,
    "learning_rate": 1e-4,
    "model_type": "siren",
    "i_print": 100,
    "i_save": 10000,
    "i_mesh": 1000,
}

PIGAN_TRAIN_DEFAULTS = {
    # pi_GAN/train.py:23-42
    "render_near": 0.5,
    "render_far": 1.5,
    "render_coarse_sample_num": 12,
    "render_fine_sample_num": 24,
    "use_dir": True,
    "z_dim": 1024,
    "iterations": [50000],
    "fade_in_itrs": [0],
    "batch_size": [64],
    "resolution": [32],
    "generator_lr": 5e-5,
    "discriminator_lr": 4e-4,
    "generator_lr_end": 1e-5,
    "discriminator_lr_end": 1e-4,
    "lr_decay": 500,
    "i_print": 100,
    "i_save": 10000,
    "i_image": 1000,
}


def resolve(config: dict, defaults: dict) -> Config:
    """Fill in defaults for missing keys (does not mutate the input).

    Mutable default values (the pi-GAN schedule lists) are copied so a
    consumer mutating its config in place can never corrupt the module-
    level default tables for every later resolve() in the process."""
    out = Config({k: (list(v) if isinstance(v, list) else v)
                  for k, v in defaults.items()})
    out.update(config)
    return out
