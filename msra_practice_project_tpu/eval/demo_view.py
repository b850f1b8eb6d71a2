"""Novel-view comparison strip: 1 train + 2 val-in + 2 val-ex views rendered
next to their ground truth (TPU port of nerf/demo_view.py:73-102).

Run: python -m msra_practice_project_tpu.eval.demo_view <log_dir> [ckpt]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..core import image_io
from ..train.train_nerf import load_dataset
from .nerf_common import load_experiment, render_view


def run(log_path: str, ckpt_idx=None):
    config, models, state, step = load_experiment(log_path, ckpt_idx)
    images, poses, width, height, focal, _ = load_dataset(config)

    picks = [("train", 0)]
    for split in ["in", "ex"]:
        n = len(images["val"][split])
        for j in range(min(2, n)):
            picks.append((split, j))

    key = jax.random.PRNGKey(0)
    cols = []
    for i, (split, j) in enumerate(picks):
        pose = (poses["train"][j] if split == "train"
                else poses["val"][split][j])
        target = (images["train"][j] if split == "train"
                  else images["val"][split][j])
        rgb, _, _ = render_view(config, models, state, width, height, focal,
                                pose, jax.random.fold_in(key, i))
        cols.append(np.concatenate([rgb, np.asarray(target[..., :3])],
                                   axis=0))
    out = os.path.join(log_path, "demo.jpg")
    image_io.imwrite(out, np.concatenate(cols, axis=1))
    print(f"demo strip ({len(picks)} views, render over truth) -> {out}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: demo_view <log_dir> [ckpt]")
    run(argv[0], int(argv[1]) if len(argv) > 1 else None)


if __name__ == "__main__":
    main()
