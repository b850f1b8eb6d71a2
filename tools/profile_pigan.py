"""Attribute the pi-GAN train-step time at a given stage geometry.

Times each component of the adversarial step separately on the real chip:
  G fwd | G fwd+bwd | D fwd | D fwd+bwd | R1 (double-grad) | d_step | g_step

Usage: python tools/profile_pigan.py [batch] [resolution]
Defaults: stage-1 geometry (batch 16 @ 64^2, 8+16 samples — the reference's
pi_GAN/configs/test.json second stage).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from msra_practice_project_tpu.models import pigan
from msra_practice_project_tpu.train import common
from msra_practice_project_tpu.train.train_pigan import (loss_f, make_gan_steps,
                                                         r1_penalty)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    cfg = pigan.GeneratorConfig(z_dim=1024, resolution=res,
                                coarse_samples=8, fine_samples=16)
    gen = pigan.Generator(cfg)
    disc = pigan.Discriminator()
    key = jax.random.PRNGKey(0)
    g_params = gen.init(key)
    d_params = disc.init(jax.random.fold_in(key, 1))

    z = jax.random.normal(jax.random.fold_in(key, 2), (batch, cfg.z_dim))
    real = jax.random.uniform(jax.random.fold_in(key, 3),
                              (batch, 3, res, res))
    rkey = jax.random.fold_in(key, 4)
    alpha = 0.5

    g_fwd = jax.jit(lambda p, k, z: gen.apply(p, k, z, res))
    d_fwd = jax.jit(lambda p, x: disc.apply(p, x, res, alpha))

    @jax.jit
    def g_fwdbwd(p, k, z):
        return jax.grad(lambda p: g_fwd(p, k, z).sum())(p)

    @jax.jit
    def d_fwdbwd(p, x):
        return jax.grad(lambda p: d_fwd(p, x).sum())(p)

    @jax.jit
    def r1_only(p, x):
        return jax.grad(
            lambda p: r1_penalty(disc.apply, p, x, res, alpha))(p)

    @jax.jit
    def d_adv_path(dp, gp, k, z):
        """d_step's G-dependent half: G fwd + D fwd/bwd on fake."""
        def loss_fn(dp):
            fake = g_fwd(jax.lax.stop_gradient(gp), k, z)
            return -jnp.mean(loss_f(disc.apply(dp, fake, res, alpha)))
        return jax.grad(loss_fn)(dp)

    g_tx = common.adam(common.interp_lr(5e-5, 1e-5, 500), betas=(0.0, 0.9))
    d_tx = common.adam(common.interp_lr(4e-4, 1e-4, 500), betas=(0.0, 0.9))
    g_state = common.init_state(g_params, g_tx)
    d_state = common.init_state(d_params, d_tx)
    d_step, g_step = make_gan_steps(gen, disc, g_tx, d_tx, res)

    rows = [
        ("G fwd (render)", timeit(g_fwd, g_params, rkey, z)),
        ("G fwd+bwd", timeit(g_fwdbwd, g_params, rkey, z)),
        ("D fwd", timeit(d_fwd, d_params, real)),
        ("D fwd+bwd", timeit(d_fwdbwd, d_params, real)),
        ("R1 double-grad", timeit(r1_only, d_params, real)),
        ("D adv path (G fwd + D f/b on fake)",
         timeit(d_adv_path, d_params, g_params, rkey, z)),
        ("full d_step", timeit(
            lambda: d_step(d_state, g_state["params"], real, z, rkey,
                           alpha)[1]["d_loss"])),
        ("full g_step", timeit(
            lambda: g_step(g_state, d_state["params"], z, rkey,
                           alpha)[1]["g_loss"])),
    ]
    print(f"batch {batch} @ {res}^2, 8+16 samples "
          f"({batch * res * res * 24:,} MLP points per G fwd)")
    for name, ms in rows:
        print(f"  {name:<38s} {ms:8.2f} ms")
    full = rows[-1][1] + rows[-2][1]
    print(f"  TOTAL d+g {full:8.2f} ms  -> {batch / full * 1e3:.1f} imgs/s")


if __name__ == "__main__":
    main()
