"""Side-by-side comparison grid across multiple experiments (ablation view).

TPU port of nerf/demo_param.py:59-103: same set of views rendered by every
experiment in the argv list, stacked experiment-per-row with ground truth on
the top row.

Run: python -m msra_practice_project_tpu.eval.demo_param <out.jpg>
     <log_dir1> <log_dir2> ...
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from ..core import image_io
from ..train.train_nerf import load_dataset
from .nerf_common import load_experiment, render_view


def run(out_path: str, log_paths: list[str], n_views: int = 3):
    rows = []
    truth_row = None
    for e, log_path in enumerate(log_paths):
        config, models, state, _ = load_experiment(log_path)
        images, poses, width, height, focal, _ = load_dataset(config)
        key = jax.random.PRNGKey(e)
        row = []
        truths = []
        for j in range(min(n_views, len(images["train"]))):
            rgb, _, _ = render_view(config, models, state, width, height,
                                    focal, poses["train"][j],
                                    jax.random.fold_in(key, j))
            row.append(rgb)
            truths.append(np.asarray(images["train"][j][..., :3]))
        rows.append(np.concatenate(row, axis=1))
        if truth_row is None:
            truth_row = np.concatenate(truths, axis=1)
    grid = np.concatenate([truth_row] + rows, axis=0)
    image_io.imwrite(out_path, grid)
    print(f"param comparison grid ({len(log_paths)} experiments) -> "
          f"{out_path}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        raise SystemExit("usage: demo_param <out.jpg> <log_dir> [log_dir...]")
    run(argv[0], argv[1:])


if __name__ == "__main__":
    main()
