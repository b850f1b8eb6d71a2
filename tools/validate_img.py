"""End-to-end SIREN image-fit quality validation.

Trains the image-regression pipeline (the reference's cameraman workload,
siren/train_img.py) on a band-limited synthetic image and checks the
full-grid reconstruction PSNR — SIREN should exceed 40 dB quickly, and the
ReLU+PE ablation should also clear a (lower) bar, exercising the model-zoo
factory the way siren/test_img.py compares backbones.

Run: python tools/validate_img.py [iterations] [size]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from msra_practice_project_tpu.core.config import SIREN_IMG_DEFAULTS, resolve
from msra_practice_project_tpu.train.train_img import render_grid, train

BARS_DB = {"siren": 40.0, "relu_pe": 28.0}


def run_one(model_type: str, iterations: int, size: int) -> float:
    exp = f"exp_{model_type}"
    # fresh run every time — a stale ckpt at `iterations` would resume into
    # a 0-step no-op and silently validate the previous build
    shutil.rmtree(os.path.join("/tmp/img_validate", exp), ignore_errors=True)
    cfg = resolve({
        "output_path": "/tmp/img_validate", "experiment_name": exp,
        "model_type": model_type, "iterations": iterations,
        "batch_size": 16384, "data_size": size,
        "i_print": max(iterations // 4, 1), "i_save": iterations,
        "i_image": iterations,
    }, SIREN_IMG_DEFAULTS)
    out = train(cfg)
    # full-grid reconstruction against the exact target (not the train batch)
    recon = np.asarray(render_grid(out["state"]["params"],
                                   apply_fn=out["model"].apply,
                                   width=out["width"], height=out["height"]))
    target = np.asarray(out["image"])[..., 0]
    psnr = -10.0 * np.log10(np.mean((recon - target) ** 2))
    print(f"[validate] {model_type}: full-grid PSNR {psnr:.1f} dB "
          f"(bar {BARS_DB[model_type]})")
    return float(psnr)


def main(iterations=1500, size=64):
    ok = True
    for model_type, bar in BARS_DB.items():
        psnr = run_one(model_type, iterations, size)
        ok = ok and psnr > bar
    print("[validate]", "PASS" if ok else "FAIL",
          f"(siren > {BARS_DB['siren']} dB, relu_pe > "
          f"{BARS_DB['relu_pe']} dB full-grid reconstruction)")
    return ok


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64)
