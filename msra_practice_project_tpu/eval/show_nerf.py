"""360-degree orbit GIF of a trained NeRF (rgb + alpha).

TPU port of nerf/show_nerf.py: 40 frames over theta in [-180, 180) at
phi = -30, radius 4, rendered at argv-set W/H/focal.

Run: python -m msra_practice_project_tpu.eval.show_nerf <log_dir> [ckpt]
     [W] [H] [focal]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..core import image_io
from ..ops import rays as ray_ops
from .nerf_common import load_experiment, render_view


def run(log_path: str, ckpt_idx=None, width=100, height=100, focal=None,
        n_frames=40):
    config, models, state, step = load_experiment(log_path, ckpt_idx)
    # default = the Blender intrinsic the model was trained with:
    # 0.5*W/tan(0.5*0.6911) = W*1.3875 (ref: nerf/show_nerf.py:17)
    focal = focal or width * 1.3875
    rgbs, accs = [], []
    key = jax.random.PRNGKey(0)
    for i, theta in enumerate(np.linspace(-180, 180, n_frames + 1)[:-1]):
        pose = ray_ops.camera_pose_deg(4.0, float(theta), -30.0)
        rgb, _, acc = render_view(config, models, state, width, height,
                                  focal, pose, jax.random.fold_in(key, i))
        rgbs.append(image_io.to8b(rgb))
        accs.append(image_io.to8b(np.repeat(acc, 3, axis=-1)))
    image_io.mimwrite(os.path.join(log_path, f"show_{step:06d}_rgb.gif"),
                      rgbs)
    image_io.mimwrite(os.path.join(log_path, f"show_{step:06d}_alpha.gif"),
                      accs)
    print(f"orbit gifs -> {log_path}/show_{step:06d}_{{rgb,alpha}}.gif")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: show_nerf <log_dir> [ckpt] [W] [H] [focal]")
    run(argv[0],
        int(argv[1]) if len(argv) > 1 else None,
        int(argv[2]) if len(argv) > 2 else 100,
        int(argv[3]) if len(argv) > 3 else 100,
        float(argv[4]) if len(argv) > 4 else None)


if __name__ == "__main__":
    main()
