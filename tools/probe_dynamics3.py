"""Dynamics probe, part 3: the LANDSCAPE between fake and real under D.

probe_dynamics2.py established that the r5c discriminator is an ordinary
foolable CNN (pixel ascent crashes its score) and that a renderable
fooling point exists (real images score -2.4 and MSE-fitting G to real
images works — the r5 bisect), yet G's gradient THROUGH D cannot reduce
the score at all at any tested lr.  The remaining explanation is a
BARRIER: D only separates real from G's current fakes; images along the
path from fake to real (half-formed blobs) are off BOTH training
distributions, and if D scores them MORE fake than the fakes themselves,
gradient descent through D can never cross — the game stalls exactly as
observed, with G matching colour statistics (moves that do descend) and
never forming structure (moves that would have to climb the barrier).

Micro-tests:
  1. FD GRADIENT CHECK — analytic directional derivative of the G loss vs
     central finite difference at the exact GAN shapes (rules out a
     custom-VJP bug in the fused film kernel as the cause).
  2. MORPH SCAN — D's score on x(t) = (1-t)*fake + t*real, t in [0,1]:
     clean, and expectation under pixel noise sigma in {0.05,0.1,0.2,0.3}
     (8 draws).  A clean barrier that a given sigma flattens into a
     monotonic slope CALIBRATES the instance-noise floor the training
     recipe actually needs (the r5c floor was 0.02 — far below any
     plausible barrier width).

Run: python tools/probe_dynamics3.py [exp_dir]   (TPU, ~2 min)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.core.artifacts import run_dir
from msra_practice_project_tpu.data.image_folder import ImageFolder
from msra_practice_project_tpu.eval.pigan_demo import load_generator

RES = 64
BATCH = 16


def main(exp: str):
    out_dir = run_dir("probe_dynamics")
    os.makedirs(out_dir, exist_ok=True)
    config = json.load(open(os.path.join(exp, "config.json")))
    config["output_path"] = os.path.dirname(os.path.abspath(exp))
    config["experiment_name"] = os.path.basename(exp.rstrip("/"))
    generator, disc, state, step0 = load_generator(config)
    g_params = state["g"]["params"]
    d_params = state["d"]["params"]
    print(f"[probe3] ckpt step {step0} from {exp}")

    ds = ImageFolder(os.path.join(exp, "_synthetic_faces"), BATCH,
                     resize=RES / 64.0)
    _, _, real = ds.get()
    real_nchw = jnp.transpose(jnp.asarray(real), (0, 3, 1, 2))

    key = jax.random.PRNGKey(123)
    z = jax.random.normal(key, (BATCH, config["z_dim"]))

    # ---- 1. finite-difference gradient check -----------------------------
    k_fix = jax.random.fold_in(key, 1)

    @jax.jit
    def g_loss(gp):
        img = generator.apply(gp, k_fix, z, RES)
        return jnp.mean(jax.nn.softplus(disc.apply(d_params, img, RES,
                                                   -1.0)))

    grads = jax.jit(jax.grad(g_loss))(g_params)
    kd = jax.random.fold_in(key, 2)
    leaves, treedef = jax.tree.flatten(g_params)
    dirs = [jax.random.normal(jax.random.fold_in(kd, i), l.shape)
            for i, l in enumerate(leaves)]
    dirs = jax.tree.unflatten(treedef, dirs)
    dnorm = float(jnp.sqrt(sum(jnp.sum(d * d)
                               for d in jax.tree.leaves(dirs))))
    dirs = jax.tree.map(lambda d: d / dnorm, dirs)
    analytic = float(sum(jnp.sum(g * d) for g, d in zip(
        jax.tree.leaves(grads), jax.tree.leaves(dirs))))
    for eps in (1e-3, 3e-4):
        plus = jax.tree.map(lambda p, d: p + eps * d, g_params, dirs)
        minus = jax.tree.map(lambda p, d: p - eps * d, g_params, dirs)
        fd = (float(g_loss(plus)) - float(g_loss(minus))) / (2 * eps)
        rel = abs(fd - analytic) / max(abs(analytic), 1e-12)
        print(f"[probe3] FD CHECK eps {eps:g}: analytic {analytic:.6f} "
              f"fd {fd:.6f} rel-err {rel:.3f}")

    # ---- 2. morph scan ----------------------------------------------------
    fake = jax.jit(lambda gp: generator.apply(gp, k_fix, z, RES))(g_params)
    ts = jnp.linspace(0.0, 1.0, 21)

    @jax.jit
    def scan_scores(noise_key, sigma):
        """[21] mean D score over the batch at each morph t, one noise
        draw per (t,) shared across the batch images."""
        def one_t(carry, args):
            t, k = args
            x = (1 - t) * fake + t * real_nchw
            x = x + sigma * jax.random.normal(k, x.shape)
            return carry, jnp.mean(disc.apply(d_params, x, RES, -1.0))
        keys = jax.random.split(noise_key, ts.shape[0])
        _, scores = jax.lax.scan(one_t, 0, (ts, keys))
        return scores

    clean = np.asarray(scan_scores(jax.random.fold_in(key, 0), 0.0))
    print("[probe3] MORPH t:      " +
          " ".join(f"{t:5.2f}" for t in np.asarray(ts)))
    print("[probe3] clean score:  " + " ".join(f"{s:5.2f}" for s in clean))
    results = {"t": np.asarray(ts).tolist(), "clean": clean.tolist()}
    for sigma in (0.05, 0.1, 0.2, 0.3):
        acc = np.zeros(ts.shape[0])
        for i in range(8):
            acc += np.asarray(scan_scores(
                jax.random.fold_in(key, 1000 + i), sigma))
        row = acc / 8
        results[f"sigma_{sigma}"] = row.tolist()
        print(f"[probe3] sigma {sigma}: " + " ".join(f"{s:5.2f}" for s in row))

    def barrier(row):
        return float(max(row) - row[0]), all(
            row[i + 1] <= row[i] + 0.05 for i in range(len(row) - 1))

    b, m = barrier(clean)
    print(f"[probe3] clean barrier height (max - start): {b:.2f}; "
          f"monotonic-ish: {m}")
    for sigma in (0.05, 0.1, 0.2, 0.3):
        b, m = barrier(results[f"sigma_{sigma}"])
        print(f"[probe3]   sigma {sigma}: barrier {b:.2f}, "
              f"monotonic-ish {m}")

    with open(os.path.join(out_dir, "morph_scan.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"[probe3] -> {out_dir}/morph_scan.json")


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/pigan_validate/exp_r5c_nonsat"
    main(exp)
