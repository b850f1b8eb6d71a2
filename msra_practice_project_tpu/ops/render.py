"""Hierarchical (coarse/fine) volume rendering — the shared hot core.

One implementation replaces the copy-duplicated pair in the reference
(nerf/render.py:106-182 == pi_GAN/render.py:52-241).  Differences from the
reference, all deliberate TPU-first choices:

  * `render_rays` works over arbitrary leading batch dims: [R, 3] rays for
    NeRF training batches, [B, R, 3] for the pi-GAN generator, which renders a
    whole latent batch in ONE traced computation (the reference loops over the
    batch in Python — pi_GAN/modules.py:179-181 — serialising B full renders).
  * The model is a pure function `model_fn(x[..., 6]) -> [..., 4]`; no
    point-chunking (`run_network`'s 65536-point chunks, nerf/render.py:59-75)
    — samples stay in one [rays, samples, feat] block so XLA keeps the MLP
    matmuls MXU-shaped.  Whole-image renders tile over fixed-size ray blocks
    with `lax.map` instead (static shapes, one compile).
  * RNG is threaded explicitly (stratified jitter needs a key); the fine-pass
    CDF inversion is deterministic, as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .composite import raw_to_outputs
from .rays import get_rays_flat
from .sampling import sample_pdf, stratified_samples


def render_rays(key, rays_o, rays_d, near, far, coarse_fn, fine_fn,
                coarse_sample_num: int, fine_sample_num: int,
                perturb: bool = True, white_bkgd: bool = True,
                last_dist_mode: str = "inf"):
    """Render a batch of rays (ref: nerf/render.py:106-147).

    rays_o/rays_d: [..., R, 3].  Returns a dict with coarse and fine
    rgb/depth/acc maps ([..., R, 3] / [..., R]).  `last_dist_mode` is
    forwarded to raw_to_outputs (see ops/composite.py — "mean" bounds the
    final interval for gradient-stable adversarial rendering).
    """
    view_dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    batch_shape = rays_o.shape[:-1]

    # Coarse pass: stratified samples.
    z_vals, mids = stratified_samples(
        key, near, far, coarse_sample_num, batch_shape, perturb=perturb
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    dirs = jnp.broadcast_to(view_dirs[..., None, :], pts.shape)
    raw = coarse_fn(jnp.concatenate([pts, dirs], axis=-1))
    rgb_c, depth_c, acc_c, weights = raw_to_outputs(
        raw, z_vals, rays_d, white_bkgd, last_dist_mode
    )

    # Fine pass: importance samples from the coarse weights, merged + sorted.
    z_samples = sample_pdf(mids, weights[..., 1:-1], fine_sample_num)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    dirs = jnp.broadcast_to(view_dirs[..., None, :], pts.shape)
    raw = fine_fn(jnp.concatenate([pts, dirs], axis=-1))
    rgb_f, depth_f, acc_f, _ = raw_to_outputs(raw, z_all, rays_d, white_bkgd,
                                              last_dist_mode)

    return {
        "rgb_coarse": rgb_c, "depth_coarse": depth_c, "acc_coarse": acc_c,
        "rgb_fine": rgb_f, "depth_fine": depth_f, "acc_fine": acc_f,
    }


def _pad_to_multiple(x, multiple, axis=0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode="edge"), n


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "coarse_sample_num", "fine_sample_num", "chunk",
        "perturb", "white_bkgd",
    ),
)
def _render_image_jit(key, width, height, focal, c2w, near, far,
                      coarse_fn, fine_fn, coarse_sample_num, fine_sample_num,
                      chunk, perturb, white_bkgd):
    rays_o, rays_d = get_rays_flat(width, height, focal, c2w)
    rays_o, n = _pad_to_multiple(rays_o, chunk)
    rays_d, _ = _pad_to_multiple(rays_d, chunk)
    n_tiles = rays_o.shape[0] // chunk
    rays_o = rays_o.reshape(n_tiles, chunk, 3)
    rays_d = rays_d.reshape(n_tiles, chunk, 3)
    keys = jax.random.split(key, n_tiles)

    def tile(args):
        k, ro, rd = args
        out = render_rays(
            k, ro, rd, near, far, coarse_fn, fine_fn,
            coarse_sample_num, fine_sample_num, perturb, white_bkgd,
        )
        return out["rgb_fine"], out["depth_fine"], out["acc_fine"]

    rgb, depth, acc = jax.lax.map(tile, (keys, rays_o, rays_d))
    rgb = rgb.reshape(-1, 3)[:n].reshape(height, width, 3)
    depth = depth.reshape(-1)[:n].reshape(height, width, 1)
    acc = acc.reshape(-1)[:n].reshape(height, width, 1)
    return rgb, depth, acc


def render_image(key, width, height, focal, c2w, near, far, coarse_fn,
                 fine_fn, coarse_sample_num: int, fine_sample_num: int,
                 chunk: int = 16384, perturb: bool = True,
                 white_bkgd: bool = True):
    """Full-frame render, tiled over fixed-size ray blocks
    (ref: nerf/render.py:150-167 with chunk-as-static-tile instead of a host
    loop).  Returns (rgb [H,W,3], depth [H,W,1], acc [H,W,1]) device arrays.

    Default tile = 16384 rays (the reference's eval chunk): measured ~2x the
    4096-ray tile on v5e at 64+128 samples (175-212k vs 86-100k rays/s) —
    bigger matmul blocks keep the MXU fed.  The fused train kernel was ALSO
    measured here and loses to plain XLA forward-only (≈135k rays/s): its win
    is the backward, so eval stays on the XLA path.

    `coarse_fn`/`fine_fn` should be `jax.tree_util.Partial(apply, params)`
    objects — they travel through jit as pytrees, so params updates don't
    retrigger compilation.
    """
    chunk = min(chunk, width * height)
    return _render_image_jit(
        key, width, height, focal, c2w, near, far, coarse_fn, fine_fn,
        coarse_sample_num, fine_sample_num, chunk, perturb, white_bkgd,
    )


def _sharded_tile_fn(mesh, axis, near, far, coarse_sample_num,
                     fine_sample_num, perturb, white_bkgd):
    from jax.sharding import PartitionSpec as P

    def run(keys, rays_o, rays_d, coarse_fn, fine_fn):
        def local(keys, ro, rd, coarse_fn, fine_fn):
            def tile(args):
                k, o, d = args
                out = render_rays(
                    k, o, d, near, far, coarse_fn, fine_fn,
                    coarse_sample_num, fine_sample_num, perturb, white_bkgd,
                )
                return out["rgb_fine"], out["depth_fine"], out["acc_fine"]

            return jax.lax.map(tile, (keys, ro, rd))

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(axis), P(axis), P(axis)),
        )(keys, rays_o, rays_d, coarse_fn, fine_fn)

    return jax.jit(run)


_SHARDED_TILE_CACHE: dict = {}


def render_image_sharded(key, width, height, focal, c2w, near, far,
                         coarse_fn, fine_fn, coarse_sample_num: int,
                         fine_sample_num: int, mesh, chunk: int = 16384,
                         perturb: bool = True, white_bkgd: bool = True,
                         axis: str = "data"):
    """`render_image` with the ray-tile axis sharded over a device mesh.

    Each device renders its own contiguous block of ray tiles (lax.map over
    the local tiles inside a shard_map), so eval/demo renders scale across
    chips the same way train batches do — the SP/CP role SURVEY §2.4
    identifies for the rays axis.  Output equals `render_image` for the same
    tiling (exactly so when perturb=False).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    total = width * height
    chunk = min(chunk, max(1, -(-total // n_dev)))
    rays_o, rays_d = get_rays_flat(width, height, focal, jnp.asarray(c2w))
    rays_o, n = _pad_to_multiple(rays_o, chunk * n_dev)
    rays_d, _ = _pad_to_multiple(rays_d, chunk * n_dev)
    n_tiles = rays_o.shape[0] // chunk
    rays_o = rays_o.reshape(n_tiles, chunk, 3)
    rays_d = rays_d.reshape(n_tiles, chunk, 3)
    keys = jax.random.split(key, n_tiles)

    sh = NamedSharding(mesh, P(axis))
    rays_o = jax.device_put(rays_o, sh)
    rays_d = jax.device_put(rays_d, sh)
    keys = jax.device_put(keys, sh)

    cache_key = (mesh, axis, float(near), float(far), coarse_sample_num,
                 fine_sample_num, perturb, white_bkgd)
    fn = _SHARDED_TILE_CACHE.get(cache_key)
    if fn is None:
        fn = _sharded_tile_fn(*cache_key)
        _SHARDED_TILE_CACHE[cache_key] = fn
    rgb, depth, acc = fn(keys, rays_o, rays_d, coarse_fn, fine_fn)
    rgb = rgb.reshape(-1, 3)[:n].reshape(height, width, 3)
    depth = depth.reshape(-1)[:n].reshape(height, width, 1)
    acc = acc.reshape(-1)[:n].reshape(height, width, 1)
    return rgb, depth, acc


def render_video(key, width, height, focal, poses, near, far, coarse_fn,
                 fine_fn, coarse_sample_num, fine_sample_num,
                 chunk: int = 16384):
    """Render a pose sequence (ref: nerf/render.py:170-182).  Returns stacked
    numpy arrays (frames move to host as they complete)."""
    import numpy as np

    rgbs, depths, accs = [], [], []
    for i, p in enumerate(poses):
        k = jax.random.fold_in(key, i)
        rgb, depth, acc = render_image(
            k, width, height, focal, jnp.asarray(p), near, far,
            coarse_fn, fine_fn, coarse_sample_num, fine_sample_num, chunk,
        )
        rgbs.append(np.asarray(rgb))
        depths.append(np.asarray(depth))
        accs.append(np.asarray(acc))
    return np.stack(rgbs), np.stack(depths), np.stack(accs)
