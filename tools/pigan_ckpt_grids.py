"""Post-hoc diagnostic: per-checkpoint sample grids for any pi-GAN run.

Renders the SAME 8 latents at every saved checkpoint of an experiment dir
and stacks the rows chronologically into one image, so the moment
structure appears — or collapses (the 30k face run's stage-0 flat-field /
stage-1 speckle failure was found this way) — is visible at a glance.
tools/validate_pigan.py writes the same artifact (ckpt_evolution.png)
inline; this tool regenerates it for finished/foreign experiment dirs.

Run: python tools/pigan_ckpt_grids.py <experiment_dir> [resolution] [--cpu]

`--cpu` forces the CPU backend (re-pinning jax_platforms AFTER import —
the env var alone is overridden by sitecustomize): the standard way to
spot-check a live TPU run's checkpoints with zero chip contention.
Also prints per-ckpt diversity / low-freq structure / center-corner head
contrast against the run's own dataset, so collapse trajectories are
quantified, not just eyeballed."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu must act BEFORE the package import: the persistent compile cache
# is enabled at import time (core/compile_cache.py) and replaying an
# XLA:CPU AOT entry compiled on a different host can SIGILL.
_FORCE_CPU = "--cpu" in sys.argv
if _FORCE_CPU:
    os.environ["MSRA_TPU_COMPILE_CACHE"] = "0"

import jax

if _FORCE_CPU:
    # env var alone is re-pinned by sitecustomize; update after import
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.core import ckpt as ckpt_lib
from msra_practice_project_tpu.core import image_io
from msra_practice_project_tpu.eval.pigan_demo import _grid, load_generator


def main(exp: str, res: int = 64) -> str:
    from validate_pigan import center_corner_contrast, lowfreq_spatial_std

    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(exp)
    config["experiment_name"] = os.path.basename(exp)

    generator, _, state, _ = load_generator(config)
    template = {"g": state["g"], "d": state["d"], "step": 0}

    key = jax.random.PRNGKey(7)
    z = jax.random.normal(key, (8, generator.cfg.z_dim))
    theta = jnp.zeros((8,))
    phi = jnp.zeros((8,))

    # dataset reference values for the structure metrics, when available
    data_dir = os.path.join(exp, "_synthetic_faces")
    lf_real = cc_real = None
    if os.path.isdir(data_dir):
        from msra_practice_project_tpu.data.image_folder import ImageFolder
        ds = ImageFolder(data_dir, 64, resize=res / 64.0)
        _, _, real = ds.get()
        real = np.asarray(real)
        lf_real = lowfreq_spatial_std(real)
        cc_real = center_corner_contrast(real)
        print(f"real @{res}: lowfreq {lf_real:.4f}  "
              f"center-corner {cc_real:.4f}")

    steps = [s for s, _ in ckpt_lib.list_checkpoints(exp)]
    if not steps:
        print(f"no checkpoints under {exp} yet")
        return ""
    rows = []
    for s in steps:
        restored = ckpt_lib.restore(ckpt_lib.ckpt_path(exp, s), template)
        gp = restored["g"]["params"]
        film = generator.get_mapping(gp, z)
        imgs = np.asarray(generator.render_film(
            gp, jax.random.fold_in(key, s), film, theta, phi,
            resolution=res))
        rows.append(imgs)
        lf, cc = lowfreq_spatial_std(imgs), center_corner_contrast(imgs)
        pct = (f" ({100 * lf / lf_real:.0f}%/{100 * cc / cc_real:.0f}% "
               "of real)") if lf_real else ""
        print(f"ckpt {s}: min {imgs.min():.3f} max {imgs.max():.3f} "
              f"div {imgs.std(axis=0).mean():.3f} lowfreq {lf:.4f} "
              f"center-corner {cc:.4f}{pct}")

    out = os.path.join(exp, "ckpt_evolution.png")
    image_io.imwrite(out, _grid(np.stack(rows)))
    print("rows (top->bottom):", steps, "->", out)
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    main(args[0], int(args[1]) if len(args) > 1 else 64)
