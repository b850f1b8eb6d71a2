"""Alpha compositing of raw (rgb, sigma) samples into pixel values.

Replaces `raw_to_outputs` (nerf/render.py:78-103).  The transmittance
`cumprod` is the only sequential op in the render path; XLA lowers the
exclusive cumprod over the (static, small) sample axis to a log-depth scan on
the VPU, fused with the surrounding elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp

INF_DIST = 1e10


def raw_to_outputs(raw, z_vals, rays_d, white_bkgd: bool = True):
    """raw [..., S, 4] (rgb in [0,1], sigma >= 0 — activations are applied by
    the model heads), z_vals [..., S], rays_d [..., 3].

    Returns (rgb_map [..., 3], depth_map [...], acc_map [...], weights
    [..., S]) — semantics identical to nerf/render.py:78-103, including the
    white-background composite `rgb += (1 - acc)` (:101).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], INF_DIST)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = raw[..., :3]
    alpha = 1.0 - jnp.exp(-raw[..., 3] * dists)

    # Exclusive cumprod of (1 - alpha + 1e-10): transmittance T_i.
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, depth_map, acc_map, weights
