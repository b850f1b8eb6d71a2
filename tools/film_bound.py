"""Quantify the VPU-sine bound on the pi-GAN FiLM-SIREN generator step.

VERDICT r1 #3: the G step was declared sin-bound at ~123 imgs/s train; this
probe verifies the bound by measuring, at the stage-0 geometry (batch 64 @
32^2, 8+16 samples = 1.57M points):

  1. the full generator forward,
  2. a matmul-only clone of the trunk (sin -> identity),
  3. the isolated sin volume at the trunk's exact shapes,
  4. jnp.sin throughput on big tiles (the VPU transcendental roofline).

If (1) - (2) ~ (3), the trunk is transcendental-bound and no amount of
matmul fusion (ops/pallas/film_mlp.py) can win — the kernel's fate follows.

Run on TPU: python tools/film_bound.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msra_practice_project_tpu.models import pigan

B, RES, NC, NF = 64, 32, 8, 16
PTS = B * RES * RES * (NC + NC + NF)  # coarse pass + fine pass points


def timeit(fn, args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"backend: {jax.default_backend()}  points/step: {PTS:,}")
    key = jax.random.PRNGKey(0)
    cfg = pigan.GeneratorConfig(z_dim=1024, resolution=RES,
                                coarse_samples=NC, fine_samples=NF)
    g = pigan.Generator(cfg)
    gp = g.init(key)
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, 1024))

    fwd = jax.jit(lambda p, k, z: g.apply(p, k, z).sum())
    t_fwd = timeit(fwd, (gp, jax.random.fold_in(key, 2), z))
    print(f"G fwd (sum-synced)              {t_fwd:8.2f} ms "
          f"({B / t_fwd * 1e3:,.0f} imgs/s)")

    # trunk sin volume: 8 film layers x 256 + rgb-branch film x 256, both
    # passes -> per point ~9 x 256 sins
    n_sin = PTS * 9 * 256

    x = jax.random.uniform(jax.random.fold_in(key, 3),
                           (1 << 20, 256)) * 30.0  # SIREN-scale args

    sin9 = jax.jit(lambda x: _chain(x, 9, True))
    idn9 = jax.jit(lambda x: _chain(x, 9, False))
    t_sin = timeit(sin9, (x,))
    t_idn = timeit(idn9, (x,))
    per_sin = (t_sin - t_idn) / (9 * x.size) * 1e-3  # s per sin
    t_bound = n_sin * per_sin * 1e3
    print(f"sin chain 9x[1M,256]            {t_sin:8.2f} ms "
          f"(identity {t_idn:.2f})")
    print(f"VPU sin rate: {1 / per_sin / 1e9:.2f} Gsin/s -> step sin volume "
          f"{n_sin / 1e9:.2f} G -> lower bound {t_bound:.1f} ms")
    print(f"sin share of G fwd: {t_bound / t_fwd * 100:.0f}%")


def _chain(x, n, use_sin):
    for i in range(n):
        x = jnp.sin(x) if use_sin else x * 1.0001
    return x.sum()


if __name__ == "__main__":
    main()
