"""A/B the FiLM trunk dispatch modes inside the generator hot paths.

Measures G fwd and G fwd+bwd (sum-loss) at a given stage geometry for each
MSRA_TPU_FUSED_FILM mode: 0 = pure XLA, 1 = hybrid (XLA fwd / Pallas bwd),
2 = fully fused Pallas.

Usage: python tools/film_modes.py [batch] [resolution] [modes]
(default 16 64 0,1,2).  Tile sizes come from FILM_MLP_FWD_TILE /
FILM_MLP_BWD_TILE env vars (read at import — set them before launching).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from msra_practice_project_tpu.models import pigan


def timeit(fn, *args, n=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    cfg = pigan.GeneratorConfig(z_dim=1024, resolution=res,
                                coarse_samples=8, fine_samples=16)
    key = jax.random.PRNGKey(0)
    gen = pigan.Generator(cfg)
    params = gen.init(key)
    z = jax.random.normal(jax.random.fold_in(key, 2), (batch, cfg.z_dim))
    rkey = jax.random.fold_in(key, 4)

    modes = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["0", "1", "2"])
    from msra_practice_project_tpu.ops.pallas import film_mlp
    print(f"batch {batch} @ {res}^2, 8+16 samples, "
          f"tiles fwd={film_mlp.FWD_TILE} bwd={film_mlp.BWD_TILE}")
    for mode in modes:
        os.environ["MSRA_TPU_FUSED_FILM"] = mode
        # fresh jit closures per mode (render_film's jit cache keys on the
        # Generator instance -> make a new one)
        g = pigan.Generator(cfg)

        fwd = jax.jit(lambda p, k, z: g.apply(p, k, z, res).sum())
        fb = jax.jit(jax.grad(lambda p, k, z: g.apply(p, k, z, res).sum()))
        t_f = timeit(fwd, params, rkey, z)
        # sync the loss only (grads stay on device): wrap to a scalar probe
        fb_probe = jax.jit(
            lambda p, k, z: jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum(),
                jax.grad(lambda p: g.apply(p, k, z, res).sum())(p),
                jnp.float32(0)))
        t_fb = timeit(fb_probe, params, rkey, z)
        del fb
        print(f"  mode {mode}:  G fwd {t_f:7.2f} ms   G fwd+bwd {t_fb:7.2f} ms"
              f"   ({batch / t_fb * 1e3:6.1f} imgs/s f+b)")


if __name__ == "__main__":
    main()
