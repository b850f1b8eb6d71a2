"""Differentiable augmentation for GAN discriminators (DiffAugment).

Zhao et al. 2020, "Differentiable Augmentation for Data-Efficient GAN
Training": apply the SAME random, differentiable augmentations to both
real and fake images before D, in both the D and G losses.  D can no
longer memorise the finite real set (every presentation differs), yet
gradients still flow to G through the augmented fakes, so the equilibrium
generator distribution is unchanged.

This is the canonical fix for the failure mode our synthetic-data gates
measure: on a small, clean dataset D separates real/fake outright and the
reference's saturating g_loss (pi_GAN/utils.py:28-29) starves G.  It is a
framework knob beyond the reference driver (default OFF = the reference's
exact dynamics), enabled per-run via the `diff_augment` config string,
e.g. "color,translation,cutout".

All ops are in-graph (jit/vmap-friendly, NCHW float images in [0,1]) and
draw per-image randomness from an explicit key, keeping the trainer's
deterministic-resume contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand(key, n, lo, hi):
    return jax.random.uniform(key, (n,), minval=lo, maxval=hi)


def brightness(x, key):
    """x + U(-0.5, 0.5) per image (paper's default range)."""
    b = _rand(key, x.shape[0], -0.5, 0.5)
    return x + b[:, None, None, None]


def saturation(x, key):
    """(x - mean_c) * U(0, 2) + mean_c, per image."""
    mean = x.mean(axis=1, keepdims=True)
    s = _rand(key, x.shape[0], 0.0, 2.0)
    return (x - mean) * s[:, None, None, None] + mean


def contrast(x, key):
    """(x - mean_chw) * U(0.5, 1.5) + mean_chw, per image."""
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    c = _rand(key, x.shape[0], 0.5, 1.5)
    return (x - mean) * c[:, None, None, None] + mean


def color(x, key):
    k1, k2, k3 = jax.random.split(key, 3)
    return contrast(saturation(brightness(x, k1), k2), k3)


def translation(x, key, ratio=0.125):
    """Per-image integer shift up to ratio*size, zero-padded (no wrap)."""
    n, c, h, w = x.shape
    sh = max(int(h * ratio), 1)
    sw = max(int(w * ratio), 1)
    k1, k2 = jax.random.split(key)
    ty = jax.random.randint(k1, (n,), -sh, sh + 1)
    tx = jax.random.randint(k2, (n,), -sw, sw + 1)
    pad = jnp.pad(x, ((0, 0), (0, 0), (sh, sh), (sw, sw)))

    def shift_one(img, dy, dx):
        return jax.lax.dynamic_slice(img, (0, sh + dy, sw + dx), (c, h, w))

    return jax.vmap(shift_one)(pad, ty, tx)


def cutout(x, key, ratio=0.5):
    """Zero one random (ratio*h, ratio*w) square per image."""
    n, _, h, w = x.shape
    ch = max(int(h * ratio), 1)
    cw = max(int(w * ratio), 1)
    k1, k2 = jax.random.split(key)
    # paper places the cutout centre uniformly, window clipped at borders
    oy = jax.random.randint(k1, (n,), -(ch // 2), h - ch + ch // 2 + 1)
    ox = jax.random.randint(k2, (n,), -(cw // 2), w - cw + cw // 2 + 1)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = ((yy >= oy[:, None, None]) & (yy < oy[:, None, None] + ch)
              & (xx >= ox[:, None, None]) & (xx < ox[:, None, None] + cw))
    return x * (~inside)[:, None, :, :]


_OPS = {"color": color, "translation": translation, "cutout": cutout,
        "brightness": brightness, "saturation": saturation,
        "contrast": contrast}


def parse_policy(policy: str):
    """Validate a comma-separated op list; returns the op names."""
    names = [p.strip() for p in str(policy).split(",") if p.strip()]
    unknown = [p for p in names if p not in _OPS]
    if unknown:
        raise ValueError(f"unknown diff_augment op(s) {unknown}; "
                         f"available: {sorted(_OPS)}")
    return names


def augment(x, key, policy: str):
    """Apply the policy's ops in order with per-op fresh keys."""
    names = parse_policy(policy)
    for i, name in enumerate(names):
        x = _OPS[name](x, jax.random.fold_in(key, i))
    return x
