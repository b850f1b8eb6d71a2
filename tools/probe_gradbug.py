"""Localise the broken G gradient found by probe_dynamics3's FD check.

probe3 measured, at the exact GAN shapes (batch 16, res 64, 8+16 samples),
analytic directional derivative -4.9e6 vs finite-difference ~-1.2: the
gradient of the G loss is wrong by ~1e6 in magnitude.  This tool compares
the gradient under each film-trunk dispatch mode (MSRA_TPU_FUSED_FILM:
0 = pure XLA autodiff, 1 = hybrid XLA-fwd + Pallas-bwd [default],
2 = fused Pallas both ways) and FD-checks each, printing per-leaf norms,
to pin the bug to a dispatch path and a parameter leaf.

Run: python tools/probe_gradbug.py [exp_dir]   (TPU, ~2 min)
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


def leaf_norms(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(leaf_norms(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(leaf_norms(v, f"{prefix}{i}."))
    else:
        out[prefix.rstrip(".")] = float(jnp.linalg.norm(tree.ravel()))
    return out


def main(exp: str):
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(os.path.abspath(exp))
    config["experiment_name"] = os.path.basename(exp.rstrip("/"))
    generator, disc, state, step0 = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]
    print(f"[gradbug] ckpt step {step0}")

    key = jax.random.PRNGKey(123)
    z = jax.random.normal(key, (BATCH, config["z_dim"]))
    k_fix = jax.random.fold_in(key, 1)

    def g_loss(gp):
        img = generator.apply(gp, k_fix, z, RES)
        return jnp.mean(jax.nn.softplus(disc.apply(d_params, img, RES,
                                                   -1.0)))

    # one fixed random unit direction, shared across modes
    kd = jax.random.fold_in(key, 2)
    leaves, treedef = jax.tree.flatten(g_params)
    dirs = [jax.random.normal(jax.random.fold_in(kd, i), l.shape)
            for i, l in enumerate(leaves)]
    dirs = jax.tree.unflatten(treedef, dirs)
    dnorm = float(jnp.sqrt(sum(jnp.sum(d * d)
                               for d in jax.tree.leaves(dirs))))
    dirs = jax.tree.map(lambda d: d / dnorm, dirs)

    for mode in ("0", "1", "2"):
        os.environ["MSRA_TPU_FUSED_FILM"] = mode

        # fresh jit identities per mode (the dispatch is read at trace time)
        def loss_m(gp, _mode=mode):
            return g_loss(gp)

        grads = jax.jit(jax.grad(loss_m))(g_params)
        norms = leaf_norms(grads)
        total = float(np.sqrt(sum(v * v for v in norms.values())))
        analytic = float(sum(jnp.sum(g * d) for g, d in zip(
            jax.tree.leaves(grads), jax.tree.leaves(dirs))))
        eps = 1e-3
        jl = jax.jit(loss_m)
        plus = jax.tree.map(lambda p, d: p + eps * d, g_params, dirs)
        minus = jax.tree.map(lambda p, d: p - eps * d, g_params, dirs)
        fd = (float(jl(plus)) - float(jl(minus))) / (2 * eps)
        print(f"[gradbug] mode {mode}: |grad| {total:.3e}  directional "
              f"analytic {analytic:.4f} vs fd {fd:.4f}")
        big = sorted(norms.items(), key=lambda kv: -kv[1])[:6]
        print(f"[gradbug]   top leaves: " +
              "  ".join(f"{k}={v:.3e}" for k, v in big))
    os.environ["MSRA_TPU_FUSED_FILM"] = "1"


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/pigan_validate/exp_r5c_nonsat"
    main(exp)
