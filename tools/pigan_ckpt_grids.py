"""Post-hoc diagnostic: per-checkpoint sample grids for any pi-GAN run.

Renders the SAME 8 latents at every saved checkpoint of an experiment dir
and stacks the rows chronologically into one image, so the moment
structure appears — or collapses (the 30k face run's stage-0 flat-field /
stage-1 speckle failure was found this way) — is visible at a glance.
tools/validate_pigan.py writes the same artifact (ckpt_evolution.png)
inline; this tool regenerates it for finished/foreign experiment dirs.

Run: python tools/pigan_ckpt_grids.py <experiment_dir> [resolution]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.core import ckpt as ckpt_lib
from msra_practice_project_tpu.core import image_io
from msra_practice_project_tpu.eval.pigan_demo import _grid, load_generator


def main(exp: str, res: int = 64) -> str:
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(exp)
    config["experiment_name"] = os.path.basename(exp)

    generator, _, state, _ = load_generator(config)
    template = {"g": state["g"], "d": state["d"], "step": 0}

    key = jax.random.PRNGKey(7)
    z = jax.random.normal(key, (8, generator.cfg.z_dim))
    theta = jnp.zeros((8,))
    phi = jnp.zeros((8,))

    steps = [s for s, _ in ckpt_lib.list_checkpoints(exp)]
    rows = []
    for s in steps:
        restored = ckpt_lib.restore(ckpt_lib.ckpt_path(exp, s), template)
        gp = restored["g"]["params"]
        film = generator.get_mapping(gp, z)
        imgs = np.asarray(generator.render_film(
            gp, jax.random.fold_in(key, s), film, theta, phi,
            resolution=res))
        rows.append(imgs)
        print(f"ckpt {s}: min {imgs.min():.3f} max {imgs.max():.3f} "
              f"spatial-std {imgs.std(axis=(1, 2)).mean():.4f}")

    out = os.path.join(exp, "ckpt_evolution.png")
    image_io.imwrite(out, _grid(np.stack(rows)))
    print("rows (top->bottom):", steps, "->", out)
    return out


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 64)
