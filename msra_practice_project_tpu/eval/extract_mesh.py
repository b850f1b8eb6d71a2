"""Extract a mesh from a trained pi-GAN generator's density field.

Ref: pi_GAN/extract_mesh.py + pi_GAN/utils.py:42-106: sample one identity's
film code, evaluate sigma on an N^3 grid over the +-0.1 cube, negate it
(pseudo-SDF), and run marching cubes at level -20.

Run: python -m msra_practice_project_tpu.eval.extract_mesh <config.json> [N]
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import mesh as mesh_lib
from ..core.config import PIGAN_TRAIN_DEFAULTS, log_dir
from ..train import common
from .pigan_demo import load_generator

BOUND = 0.1      # voxel_origin = [-0.1]*3, cube edge 0.2 (pi_GAN/utils.py:56-57)
LEVEL = -20.0    # marching level on -sigma (pi_GAN/utils.py:135-137)


@partial(jax.jit, static_argnames=("trunk_apply", "n"))
def _sigma_slice(trunk_params, film, x_coord, *, trunk_apply, n: int):
    grid = jnp.linspace(-BOUND, BOUND, n)
    yy, zz = jnp.meshgrid(grid, grid, indexing="ij")
    pos = jnp.stack([jnp.full_like(yy, x_coord), yy, zz], axis=-1)
    pts = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1).reshape(-1, 6)
    raw = trunk_apply(trunk_params, pts[None], film)  # film [1, 9, 512]
    return -raw[0, :, 3].reshape(n, n)     # negated sigma = pseudo-SDF


def extract_mesh(generator, g_params, key, filename: str, n: int = 256,
                 level: float = LEVEL, watchdog=None):
    film = generator.get_mapping(
        g_params, jax.random.normal(key, (1, generator.cfg.z_dim)))
    xs = np.linspace(-BOUND, BOUND, n)
    values = np.empty((n, n, n), np.float32)
    for i, x in enumerate(xs):
        if watchdog is not None:
            watchdog.beat(f"sigma slice {i}/{n}")
        values[i] = np.asarray(_sigma_slice(
            g_params["trunk"], film, jnp.float32(x),
            trunk_apply=generator.trunk.apply, n=n))
    voxel_size = 2 * BOUND / (n - 1)
    if watchdog is not None:
        # host-side marching can legitimately exceed the heartbeat
        watchdog.pause()
    try:
        verts, faces = mesh_lib.extract_mesh_from_grid(
            values, level, (-BOUND,) * 3, voxel_size, filename + ".ply")
    finally:
        if watchdog is not None:
            watchdog.resume()
    if verts.shape[0] == 0:
        # values holds -sigma; an isosurface at level=-20 needs sigma to
        # cross 20 inside the +-BOUND cube (true for the reference's fully
        # trained face models, not for short smoke runs with diffuse fields).
        print(f"[extract_mesh] empty isosurface: sigma in "
              f"[{-values.max():.2f}, {-values.min():.2f}] never crosses "
              f"{-level:.0f} inside the +-{BOUND} cube (under-trained "
              f"generator?)")
    return verts, faces


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from .pigan_demo import _eval_watchdog, resolve_saved
    config = resolve_saved(common.parse_cli(argv[:1], PIGAN_TRAIN_DEFAULTS))
    n = int(argv[1]) if len(argv) > 1 else 256
    # Optional marching level (on -sigma).  The reference hardcodes -20
    # (pi_GAN/utils.py:135-137), calibrated for its fully-converged face
    # models; softer fields need a level inside their actual sigma range
    # (the empty-isosurface diagnostic prints that range).
    level = float(argv[2]) if len(argv) > 2 else LEVEL
    generator, _, state, step = load_generator(config)
    os.makedirs(log_dir(config), exist_ok=True)
    out = os.path.join(log_dir(config), f"mesh_{step:06d}")
    watchdog = _eval_watchdog(config)
    verts, faces = extract_mesh(generator, state["g"]["params"],
                                jax.random.PRNGKey(7), out, n=n, level=level,
                                watchdog=watchdog)
    watchdog.stop()
    print(f"mesh: {verts.shape[0]} verts, {faces.shape[0]} faces -> "
          f"{out}.ply")


if __name__ == "__main__":
    main()
