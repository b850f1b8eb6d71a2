"""Gradient-bug probe 2: FD along the analytic direction + explosion scan.

probe_gradbug showed identical, sane grads (|g| 68.6) in all dispatch
modes at one key, while probe_dynamics3 measured analytic -4.9e6 at the
SAME ckpt/key — so either the explosion is intermittent (suspect: the
Pallas film backward) or probe3's path differed subtly.  Also the random
test direction had a true derivative (~0.008) far below float32 FD noise
(~0.001/eps), so probe_gradbug's fd numbers were meaningless.

Rigorous tests:
  1. FD along the ANALYTIC gradient direction: true derivative then equals
     |grad| (~68) — far above FD noise.  Run per dispatch mode.
  2. EXPLOSION SCAN: |grad| at 48 different step keys, mode 1 (hybrid,
     the training default) vs mode 0 (pure XLA).  An intermittent kernel
     bug shows up as rare huge |grad| in mode 1 only.

Run: python tools/probe_gradbug2.py [exp_dir]   (TPU, ~3 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.data.image_folder import ImageFolder
from msra_practice_project_tpu.eval.pigan_demo import load_generator

RES = 64
BATCH = 16


def main(exp: str):
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(os.path.abspath(exp))
    config["experiment_name"] = os.path.basename(exp.rstrip("/"))
    generator, disc, state, step0 = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]
    print(f"[gradbug2] ckpt step {step0}")

    key = jax.random.PRNGKey(123)
    z = jax.random.normal(key, (BATCH, config["z_dim"]))

    def make_fns(mode: str):
        os.environ["MSRA_TPU_FUSED_FILM"] = mode

        def loss(gp, k):
            img = generator.apply(gp, k, z, RES)
            return jnp.mean(jax.nn.softplus(
                disc.apply(d_params, img, RES, -1.0)))

        return jax.jit(loss), jax.jit(jax.grad(loss))

    # ---- 1. FD along the analytic direction, per mode --------------------
    k_fix = jax.random.fold_in(key, 1)
    for mode in ("0", "1", "2"):
        jl, jg = make_fns(mode)
        g = jg(g_params, k_fix)
        gnorm = float(np.sqrt(sum(float(jnp.sum(l * l))
                                  for l in jax.tree.leaves(g))))
        d = jax.tree.map(lambda l: l / gnorm, g)
        for eps in (1e-3, 3e-3):
            plus = jax.tree.map(lambda p, dd: p + eps * dd, g_params, d)
            minus = jax.tree.map(lambda p, dd: p - eps * dd, g_params, d)
            fd = (float(jl(plus, k_fix)) - float(jl(minus, k_fix))) / (2 * eps)
            print(f"[gradbug2] mode {mode} eps {eps:g}: |grad| {gnorm:.2f} "
                  f"(= expected fd)  measured fd {fd:.2f}  "
                  f"ratio {fd / gnorm:.3f}")

    # ---- 2. explosion scan ------------------------------------------------
    for mode in ("1", "0"):
        _, jg = make_fns(mode)
        norms = []
        for i in range(48):
            g = jg(g_params, jax.random.fold_in(key, 100 + i))
            n = float(np.sqrt(sum(float(jnp.sum(l * l))
                                  for l in jax.tree.leaves(g))))
            norms.append(n)
        norms = np.array(norms)
        print(f"[gradbug2] mode {mode} |grad| over 48 keys: "
              f"min {norms.min():.2f} median {np.median(norms):.2f} "
              f"max {norms.max():.2e} n>1e3 {(norms > 1e3).sum()} "
              f"nan {np.isnan(norms).sum()}")
    os.environ["MSRA_TPU_FUSED_FILM"] = "1"


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/pigan_validate/exp_r5c_nonsat"
    main(exp)
