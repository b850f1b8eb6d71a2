"""Depth sampling along rays: stratified coarse pass + inverse-CDF fine pass.

Replaces nerf/render.py:27-56 (`sample_pdf`) and the stratified jitter block
(nerf/render.py:127-132).  Everything is fixed-shape and branch-free: the CDF
inversion uses a broadcast comparison count instead of `searchsorted` +
`gather`, which maps onto the VPU as one fused reduction and is directly
reusable inside a Pallas kernel later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_samples(key, near, far, n_samples: int, batch_shape,
                       perturb: bool = True, dtype=None):
    """Linspace z in [near, far] with per-interval uniform jitter
    (ref: nerf/render.py:123,127-132).

    Returns (z_vals [*batch_shape, n], mids [*batch_shape, n-1]).
    `mids` are midpoints of the *unjittered* grid, exactly what the reference
    feeds to sample_pdf as bins.

    dtype=None follows the active default float (f32 normally; f64 under
    jax.enable_x64 — the reference-parity test runs the whole render chain
    in float64 to factor out cross-backend fp32 rounding).
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    z = jnp.linspace(near, far, n_samples, dtype=dtype)
    z = jnp.broadcast_to(z, (*batch_shape, n_samples))
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    if not perturb:
        return z, mids
    upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
    lower = jnp.concatenate([z[..., :1], mids], axis=-1)
    t = jax.random.uniform(key, z.shape, dtype)
    return lower + (upper - lower) * t, mids


def sample_pdf(bins, weights, n_samples: int):
    """Inverse-CDF importance sampling (ref: nerf/render.py:27-56).

    bins:    [..., B]   (bin edges; B = n_coarse - 1 midpoints in NeRF use)
    weights: [..., B-1] (unnormalised pdf over the B-1 intervals)

    NOTE the reference's `u` is a *uniform linspace*, not random draws
    (nerf/render.py:35) — deterministic quadrature of the CDF.  We replicate
    that exactly (and it removes an RNG dependency from the hot loop).

    Gradients are stopped: the reference calls `.detach()` on the result
    (nerf/render.py:141); we stop-grad the inputs which is equivalent and
    keeps XLA from building a dead backward graph.
    """
    if weights.shape[-1] != bins.shape[-1] - 1:
        raise ValueError(
            f"sample_pdf expects len(weights) == len(bins)-1, got "
            f"{weights.shape[-1]} vs {bins.shape[-1]}")
    bins = jax.lax.stop_gradient(bins)
    weights = jax.lax.stop_gradient(weights) + 1e-5

    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    # explicit shape for the leading zero: zeros_like(cdf[..., :1]) would be
    # EMPTY when weights has zero length (the nc=2 degenerate case)
    cdf = jnp.concatenate(
        [jnp.zeros((*cdf.shape[:-1], 1), cdf.dtype), cdf], axis=-1)
    L = cdf.shape[-1]

    u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))

    # searchsorted(cdf, u, right) == #\{cdf <= u\}: a vectorised comparison count.
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )  # [..., n_samples]
    below = jnp.clip(inds - 1, 0, L - 1)
    above = jnp.clip(inds, 0, L - 1)

    # TPU NOTE: per-element gathers (take_along_axis) are slow on TPU —
    # replace them with one-hot contractions, which the MXU eats for free.
    # `bins` has the same length L as `cdf` in all reference call sites
    # (mids vs [0|cumsum]), so one one-hot per side serves both lookups.
    iota = jnp.arange(L)
    oh_b = (below[..., None] == iota).astype(cdf.dtype)  # [..., n, L]
    oh_a = (above[..., None] == iota).astype(cdf.dtype)
    table = jnp.stack([cdf, bins], axis=-1)              # [..., L, 2]
    gb = oh_b @ table                                    # [..., n, 2]
    ga = oh_a @ table
    cdf_b, bins_b = gb[..., 0], gb[..., 1]
    cdf_a, bins_a = ga[..., 0], ga[..., 1]

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
