"""Cross-model comparison for SDF fitting experiments.

TPU port of siren/test_sdf.py: loss-curve comparison across experiments plus
a mesh statistics table (vertex/face counts of the final test.ply meshes —
the reference compares the meshes visually).

Run: python -m msra_practice_project_tpu.eval.test_sdf <out_prefix>
     <log_dir1> <log_dir2> ...
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..core.logging import MetricLogger  # noqa: E402
from ..core.mesh import read_ply  # noqa: E402


def run(out_prefix: str, log_paths: list[str]):
    plt.figure(figsize=(6, 4))
    found = False
    for lp in log_paths:
        log_file = os.path.join(lp, "log.npy")
        if os.path.exists(log_file):
            data = MetricLogger.load(log_file)
            if "loss" in data and len(data["loss"]):
                found = True
                plt.plot(data["loss"], label=os.path.basename(lp),
                         linewidth=0.8)
    if found:
        plt.yscale("log")
        plt.xlabel("iteration")
        plt.ylabel("loss")
        plt.legend()
        plt.tight_layout()
        plt.savefig(out_prefix + "_loss.png", dpi=150)
        print("plot ->", out_prefix + "_loss.png")
    plt.close()

    for lp in log_paths:
        ply = os.path.join(lp, "test.ply")
        if os.path.exists(ply):
            v, f = read_ply(ply)
            print(f"{lp}: {v.shape[0]} verts, {f.shape[0]} faces")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        raise SystemExit("usage: test_sdf <out_prefix> <log_dir> "
                         "[log_dir...]")
    run(argv[0], argv[1:])


if __name__ == "__main__":
    main()
