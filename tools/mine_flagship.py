"""Mine the surviving flagship checkpoints: gate-recalibration evidence.

The r4 flagship (100k, bigface) passed most numeric gates on samples with
zero head structure (BASELINE post-mortem).  This tool extracts, per
checkpoint, every quantity the r5 gate recalibration needs (VERDICT r4 #3):

  * trained-D feature Fréchet vs held-out real — embedded with the FINAL
    discriminator, plus the real-vs-real SANITY FLOOR under the same
    embedding (fd(realA, realB): the scale anchor the r4 gate lacked);
  * center-corner contrast (the gate the flagship scraped at 26.7%);
  * corner-background formation: mean |corner pixels - dataset background|
    — real bigface corners are uniform 0.9-gray; mottled gradient fields
    are not.  Candidate repaired gate that colour fields cannot scrape;
  * low-freq spatial std, diversity (for the trajectory record).

Also reconciles the r4 mid-run diagnostic ("cc 40% of real at 35k" vs the
final 26.7%): both poses (zeros, as pigan_ckpt_grids used) and random
validate-style poses are measured, since the discrepancy may be pose-mix.

Run: python tools/mine_flagship.py [exp_dir] [--cpu]   (TPU: ~minutes)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FORCE_CPU = "--cpu" in sys.argv
if _FORCE_CPU:
    os.environ["MSRA_TPU_COMPILE_CACHE"] = "0"

import jax

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.core import ckpt as ckpt_lib
from msra_practice_project_tpu.core.metrics import frechet_from_features
from msra_practice_project_tpu.data.image_folder import ImageFolder
from msra_practice_project_tpu.eval.pigan_demo import load_generator
from tools.validate_pigan import (center_corner_contrast,
                                  lowfreq_spatial_std)

RES = 64
N_SAMPLES = 64


def corner_background_error(imgs, bg):
    """Mean |corner-patch pixel - background colour| per image.

    Real bigface data: corners are the uniform light background (0.9 gray)
    -> error ~0.  Mottled colour-gradient fields (the flagship's failure
    mode) put arbitrary colour there -> error stays high.  Complements
    center-corner contrast, which a radial gradient can scrape without
    ever forming a background."""
    imgs = np.asarray(imgs)
    h, w = imgs.shape[1:3]
    ph, pw = h // 4, w // 4
    corners = np.concatenate([
        imgs[:, :ph, :pw, :], imgs[:, :ph, -pw:, :],
        imgs[:, -ph:, :pw, :], imgs[:, -ph:, -pw:, :]], axis=1)
    return float(np.abs(corners - bg).mean())


def main(exp: str) -> dict:
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(exp)
    config["experiment_name"] = os.path.basename(exp)

    generator, disc, state, _ = load_generator(config)
    template = {"g": state["g"], "d": state["d"], "step": 0}
    d_final = state["d"]["params"]

    def d_embed(imgs):
        x = jnp.transpose(jnp.asarray(imgs), (0, 3, 1, 2))
        return disc.apply_features(d_final, x, RES)

    # Real data: one batch as the reference set, a DISJOINT batch as the
    # held-out probe for the real-vs-real floor.
    ds = ImageFolder(os.path.join(exp, "_synthetic_faces"), N_SAMPLES,
                     resize=RES / 64.0)
    _, _, real_a = ds.get()
    _, _, real_b = ds.get()
    real_a, real_b = np.asarray(real_a), np.asarray(real_b)
    bg = float(np.median(np.concatenate([real_a[:, :8, :8, :].ravel(),
                                         real_a[:, :8, -8:, :].ravel()])))
    ef_a = d_embed(real_a)
    fd_floor = frechet_from_features(d_embed(real_b), ef_a)
    lf_real = lowfreq_spatial_std(real_a)
    cc_real = center_corner_contrast(real_a)
    cbe_real = corner_background_error(real_a, bg)
    print(f"[mine] real: lowfreq {lf_real:.4f} cc {cc_real:.4f} "
          f"corner-bg-err {cbe_real:.4f} (bg {bg:.3f})")
    print(f"[mine] trained-D Fréchet REAL-vs-REAL floor (held-out): "
          f"{fd_floor:.4f}")

    key = jax.random.PRNGKey(42)
    z = jax.random.normal(key, (N_SAMPLES, generator.cfg.z_dim))
    theta_r, phi_r = generator.sample_poses(jax.random.fold_in(key, 1),
                                            N_SAMPLES)
    zeros = jnp.zeros((N_SAMPLES,))

    steps = [s for s, _ in ckpt_lib.list_checkpoints(exp)]
    rows = []
    for s in steps:
        restored = ckpt_lib.restore(ckpt_lib.ckpt_path(exp, s), template)
        gp = restored["g"]["params"]
        film = generator.get_mapping(gp, z)
        # validate-style random poses (what the gates see)
        img_r = np.asarray(generator.render_film(
            gp, jax.random.fold_in(key, 2), film, theta_r, phi_r,
            resolution=RES))
        # zero poses (what the r4 mid-run pigan_ckpt_grids diagnostic saw)
        img_0 = np.asarray(generator.render_film(
            gp, jax.random.fold_in(key, 3), film, zeros, zeros,
            resolution=RES))
        fd = frechet_from_features(d_embed(img_r), ef_a)
        row = {
            "step": s,
            "fd_trained_d": round(float(fd), 2),
            "fd_over_floor": round(float(fd / fd_floor), 2),
            "cc_randpose": round(center_corner_contrast(img_r) / cc_real, 3),
            "cc_zeropose": round(center_corner_contrast(img_0) / cc_real, 3),
            "lowfreq": round(lowfreq_spatial_std(img_r) / lf_real, 3),
            "corner_bg_err": round(corner_background_error(img_r, bg), 4),
            "diversity": round(float(img_r.std(axis=0).mean()), 3),
        }
        rows.append(row)
        print(f"[mine] ckpt {s}: fd {row['fd_trained_d']} "
              f"({row['fd_over_floor']}x floor)  "
              f"cc rand/zero {row['cc_randpose']:.2f}/{row['cc_zeropose']:.2f}"
              f" of real  lowfreq {row['lowfreq']:.2f}  "
              f"corner-bg-err {row['corner_bg_err']:.3f} "
              f"(real {cbe_real:.3f})  div {row['diversity']}")

    out = {"fd_floor": float(fd_floor), "cc_real": cc_real,
           "lf_real": lf_real, "cbe_real": cbe_real, "bg": bg, "rows": rows}
    out_path = os.path.join(exp, "mine_flagship.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[mine] -> {out_path}")
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "pigan_validate",
        "exp2_bigface")
    main(args[0] if args else default)
