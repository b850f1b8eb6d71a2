"""pi-GAN diagnostics: D logits on real vs generated batches + loss curves.

TPU port of pi_GAN/test.py:64-85.

Run: python -m msra_practice_project_tpu.eval.pigan_test <config.json>
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..core.config import PIGAN_TRAIN_DEFAULTS, log_dir  # noqa: E402
from ..data.image_folder import ImageFolder  # noqa: E402
from ..train import common  # noqa: E402
from .pigan_demo import load_generator, resolve_saved  # noqa: E402


def run(config, n: int = 8, resolution: int | None = None):
    generator, discriminator, state, step = load_generator(config)
    g_params, d_params = state["g"]["params"], state["d"]["params"]
    log_path = log_dir(config)
    if resolution is None:
        # Diagnose D at the resolution the checkpoint was actually trained
        # at: a [32] schedule (or a [32, 64] run stopped before the switch)
        # has never updated the 64-res entry adapter/block, so probing at a
        # fixed 64 would print random-init logits.
        from ..train.train_pigan import stage_of
        iterations = [0] + list(config["iterations"])
        resolutions = list(config["resolution"])
        stage = min(stage_of(step, iterations), len(resolutions) - 1)
        resolution = int(resolutions[stage])
        print(f"[test] ckpt step {step} -> stage {stage}, "
              f"resolution {resolution}")
    key = jax.random.PRNGKey(0)

    # generated
    z = jax.random.normal(key, (n, config["z_dim"]))
    imgs = generator.apply(g_params, jax.random.fold_in(key, 1), z,
                           resolution)
    gen_logits = np.asarray(discriminator.apply(d_params, imgs, resolution,
                                                -1.0))
    print("D logits (generated):", gen_logits)

    # real (if the dataset exists)
    data_path = config["data_path"]
    if not os.path.isdir(data_path):
        data_path = os.path.join(log_path, "_synthetic_faces")
    if os.path.isdir(data_path):
        # stream exactly one batch — preload would decode + upload the
        # ENTIRE dataset to print 8 logits
        ds = ImageFolder(data_path, n, resize=resolution / 64.0,
                         preload=False, prefetch=False)
        _, _, real = ds.get()
        real = jnp.transpose(real, (0, 3, 1, 2))
        real_logits = np.asarray(discriminator.apply(d_params, real,
                                                     resolution, -1.0))
        print("D logits (real):     ", real_logits)
        # NOTE sign convention: D is trained to push real -> -inf,
        # fake -> +inf (see train_pigan.py docstring).
        print("mean real %.3f < mean fake %.3f ?"
              % (real_logits.mean(), gen_logits.mean()),
              bool(real_logits.mean() < gen_logits.mean()))
        # Distribution diagnostics (same metrics the validate_pigan gate
        # uses): random-conv Fréchet distance + within-image spatial
        # structure vs the dataset.
        from ..core.metrics import feature_distance
        gen_hwc = np.asarray(jnp.transpose(imgs, (0, 2, 3, 1)))
        real_hwc = np.asarray(jnp.transpose(real, (0, 2, 3, 1)))
        print("random-conv Frechet (gen vs real): "
              f"{feature_distance(gen_hwc, real_hwc):.4f}")
        print("within-image spatial std: real "
              f"{real_hwc.std(axis=(1, 2)).mean():.4f}, gen "
              f"{gen_hwc.std(axis=(1, 2)).mean():.4f} "
              "(flat-field collapse if gen << real)")

    # loss curves
    loss_log_path = os.path.join(log_path, "loss_log.npy")
    if os.path.exists(loss_log_path):
        loss_log = np.load(loss_log_path, allow_pickle=True).item()
        out = plot_loss_curves(loss_log,
                               os.path.join(log_path, "loss_curves.png"))
        print("loss curves ->", out)


def plot_loss_curves(loss_log: dict, out: str) -> str:
    """g/d loss-vs-iteration plot (ref: pi_GAN/test.py:78-85)."""
    plt.figure(figsize=(6, 4))
    plt.plot(loss_log["d_loss"], label="d_loss", linewidth=0.8)
    plt.plot(loss_log["g_loss"], label="g_loss", linewidth=0.8)
    plt.xlabel("iteration")
    plt.legend()
    plt.tight_layout()
    plt.savefig(out, dpi=150)
    plt.close()
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    config = resolve_saved(common.parse_cli(argv[:1], PIGAN_TRAIN_DEFAULTS))
    run(config)


if __name__ == "__main__":
    main()
