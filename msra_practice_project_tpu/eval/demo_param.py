"""Side-by-side comparison grid across multiple experiments (ablation view).

TPU port of nerf/demo_param.py:59-103: the SAME set of held-out views
(val['in'], nerf/demo_param.py:89) rendered by every experiment in the argv
list, stacked experiment-per-row with ground truth on the top row.  The
dataset (views + truth images) comes from ONE shared load — the first
experiment's config — because per-experiment reloads would pick different
train subsets (data_train_idx) or noise-perturbed poses and silently
compare different cameras per row.

Run: python -m msra_practice_project_tpu.eval.demo_param <out.jpg>
     <log_dir1> <log_dir2> ... [ckpt_idx]
(an integer last argument pins every experiment to that checkpoint, like
the reference's check_point_idx — otherwise each row shows its latest,
which can compare different amounts of training)
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from ..core import image_io
from ..train.train_nerf import load_dataset
from .nerf_common import load_experiment, render_view


def run(out_path: str, log_paths: list[str], n_views: int = 3,
        ckpt_idx: int | None = None):
    # one shared dataset: views + truth from the FIRST experiment's config
    cfg0, _, _, _ = load_experiment(log_paths[0], ckpt_idx)
    images, poses, width, height, focal, _ = load_dataset(cfg0)
    split = "in" if len(poses["val"]["in"]) else "train"
    view_poses = (poses["val"][split] if split == "in"
                  else poses["train"])[:n_views]
    view_truth = (images["val"][split] if split == "in"
                  else images["train"])[:n_views]

    rows = [np.concatenate([np.asarray(t[..., :3]) for t in view_truth],
                           axis=1)]
    for e, log_path in enumerate(log_paths):
        config, models, state, step = load_experiment(log_path, ckpt_idx)
        key = jax.random.PRNGKey(e)
        row = []
        for j, pose in enumerate(view_poses):
            rgb, _, _ = render_view(config, models, state, width, height,
                                    focal, pose, jax.random.fold_in(key, j))
            row.append(rgb)
        rows.append(np.concatenate(row, axis=1))
        print(f"[demo_param] {log_path} @ step {step}")
    grid = np.concatenate(rows, axis=0)
    image_io.imwrite(out_path, grid)
    print(f"param comparison grid ({len(log_paths)} experiments, "
          f"{split} views) -> {out_path}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        raise SystemExit("usage: demo_param <out.jpg> <log_dir> "
                         "[log_dir...] [ckpt_idx]")
    ckpt_idx = None
    if len(argv) > 2 and argv[-1].isdigit():
        ckpt_idx = int(argv[-1])
        argv = argv[:-1]
    run(argv[0], argv[1:], ckpt_idx=ckpt_idx)


if __name__ == "__main__":
    main()
