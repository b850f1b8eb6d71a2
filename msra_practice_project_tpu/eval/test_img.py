"""Cross-model comparison for SIREN image fitting experiments.

TPU port of siren/test_img.py: stitch the latest render from each experiment
into one strip and plot loss/PSNR curves from each log.npy.

Run: python -m msra_practice_project_tpu.eval.test_img <out_prefix>
     <log_dir1> <log_dir2> ...
"""

from __future__ import annotations

import glob
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..core import image_io  # noqa: E402
from ..core.logging import MetricLogger  # noqa: E402


def latest_render(log_path: str):
    pngs = sorted(glob.glob(os.path.join(log_path, "[0-9]*.png")))
    return image_io.imread(pngs[-1]) if pngs else None


def run(out_prefix: str, log_paths: list[str]):
    # image strip
    frames = []
    for lp in log_paths:
        img = latest_render(lp)
        if img is not None:
            if img.ndim == 2:
                img = img[..., None].repeat(3, axis=-1)
            frames.append(img[..., :3])
    if frames:
        h = min(f.shape[0] for f in frames)
        strip = np.concatenate([f[:h] for f in frames], axis=1)
        image_io.imwrite(out_prefix + "_renders.png", strip)
        print("strip ->", out_prefix + "_renders.png")

    # curves
    for metric in ["loss", "psnr"]:
        plt.figure(figsize=(6, 4))
        found = False
        for lp in log_paths:
            log_file = os.path.join(lp, "log.npy")
            if not os.path.exists(log_file):
                continue
            data = MetricLogger.load(log_file)
            if metric not in data or not len(data[metric]):
                continue
            found = True
            plt.plot(data[metric], label=os.path.basename(lp), linewidth=0.8)
        if not found:
            plt.close()
            continue
        if metric == "loss":
            plt.yscale("log")
        plt.xlabel("iteration")
        plt.ylabel(metric)
        plt.legend()
        plt.tight_layout()
        plt.savefig(f"{out_prefix}_{metric}.png", dpi=150)
        plt.close()
        print("plot ->", f"{out_prefix}_{metric}.png")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        raise SystemExit("usage: test_img <out_prefix> <log_dir> "
                         "[log_dir...]")
    run(argv[0], argv[1:])


if __name__ == "__main__":
    main()
