"""Neural-net primitives: dense / siren / film-siren layers + positional encoding.

Pure-functional design: every layer is an ``init(key, ...) -> params`` plus an
``apply(params, x, ...) -> y`` pair, where ``params`` is a pytree of jnp
arrays.  This keeps everything trivially compatible with ``jax.jit``,
``jax.vmap`` (e.g. vmapping a FiLM-conditioned trunk over a batch of
conditioning vectors) and ``jax.grad`` (including grad-of-grad for eikonal /
R1 terms).

Initialisation schemes mirror the reference exactly:
  * Dense: Xavier-uniform with activation gain, zero bias
    (ref: siren/modules.py:27-30, nerf/nerf.py:25-28).
  * Siren (baseline, siren stack): torch.nn.Linear default init, first/hidden
    layer weights overridden by the SIREN scheme in the MLP constructor
    (ref: siren/modules.py:79-86).
  * Siren (nerf stack): weight U(+-sqrt(6/in)/30), zero bias
    (ref: nerf/nerf.py:114-117).
  * FilmSiren: weight U(+-1/in) first layer else U(+-sqrt(c/in)/w0),
    bias U(+-sqrt(1/in)) (ref: pi_GAN/modules.py:27-31).

Weights are stored as [in_dim, out_dim] so the forward pass is a plain
``x @ w + b`` — the layout XLA tiles straight onto the MXU.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Activations (the reference resolves these by name from config via
# `eval('torch.'+name)` — siren/modules.py:16; we use an explicit table).
# ---------------------------------------------------------------------------

ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leaky_relu": partial(jax.nn.leaky_relu, negative_slope=0.2),
    "sin": jnp.sin,
}

# torch.nn.init.calculate_gain equivalents for Xavier init.
GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "relu": math.sqrt(2.0),
    "tanh": 5.0 / 3.0,
    "leaky_relu": math.sqrt(2.0 / (1.0 + 0.2**2)),
    "sin": 1.0,
}


def activation_fn(name: str):
    if name not in ACTIVATIONS:
        raise ValueError(f"unknown activation '{name}' (have {sorted(ACTIVATIONS)})")
    return ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# Elementary initialisers
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, in_dim, out_dim, gain=1.0, dtype=jnp.float32):
    """Xavier/Glorot uniform on a [in, out] weight."""
    bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return _uniform(key, (in_dim, out_dim), bound, dtype)


def torch_linear_default(key, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming-uniform(a=sqrt(5)) weight — which
    reduces to U(+-1/sqrt(in)) — and U(+-1/sqrt(in)) bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = _uniform(kw, (in_dim, out_dim), bound, dtype)
    b = _uniform(kb, (out_dim,), bound, dtype)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Dense layer (linear + named activation)
# ---------------------------------------------------------------------------


def dense_init(key, in_dim, out_dim, activation="linear", dtype=jnp.float32):
    """Xavier-uniform weight (gain from activation), zero bias."""
    w = xavier_uniform(key, in_dim, out_dim, GAINS[activation], dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def dense_apply(params, x, activation="linear"):
    y = x @ params["w"] + params["b"]
    return activation_fn(activation)(y)


# ---------------------------------------------------------------------------
# Siren layer: sin(w0 * (x @ w + b))
# ---------------------------------------------------------------------------


def siren_init(key, in_dim, out_dim, scheme="nerf", dtype=jnp.float32):
    """Init for a sine layer.

    scheme:
      'torch_default' — plain torch Linear init (siren stack baseline layer,
                        before the MLP constructor overrides the weight).
      'first'         — weight U(+-1/in), torch-default bias
                        (siren/modules.py:79).
      'hidden'        — weight U(+-sqrt(6/in)/30), torch-default bias
                        (siren/modules.py:83).
      'nerf'          — weight U(+-sqrt(6/in)/30), zero bias
                        (nerf/nerf.py:114-117).
      'nerf_first'    — weight U(+-1/30), zero bias (nerf/nerf.py:134).
    """
    kw, kb = jax.random.split(key)
    b_bound = 1.0 / math.sqrt(in_dim)
    if scheme == "torch_default":
        w_bound = 1.0 / math.sqrt(in_dim)
    elif scheme == "first":
        w_bound = 1.0 / in_dim
    elif scheme == "hidden":
        w_bound = math.sqrt(6.0 / in_dim) / 30.0
    elif scheme == "nerf":
        w_bound, b_bound = math.sqrt(6.0 / in_dim) / 30.0, 0.0
    elif scheme == "nerf_first":
        w_bound, b_bound = 1.0 / 30.0, 0.0
    else:
        raise ValueError(f"unknown siren init scheme '{scheme}'")
    w = _uniform(kw, (in_dim, out_dim), w_bound, dtype)
    b = (
        _uniform(kb, (out_dim,), b_bound, dtype)
        if b_bound > 0
        else jnp.zeros((out_dim,), dtype)
    )
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Fast sine: SIREN/FiLM trunks are VPU-transcendental-bound on TPU (sin is
# 89% of the pi-GAN generator forward — tools/film_bound.py), so the sine's
# cost IS the trunk's cost.  A degree-7 minimax polynomial with exact fp32
# range reduction runs ~4.6x the hardware sine on v5e with max abs error
# 1.8e-6 over [-30, 30] (quality A/B: identical gate results, BASELINE.md).
# Positional encodings keep exact jnp.sin — they are cheap there and the
# fused NeRF kernel's PE carries a bitwise-parity contract.
# ---------------------------------------------------------------------------

_TWO_PI = 6.283185307179586
_SIN_POLY = (0.99999660, -0.16664824, 0.00830629, -0.00018363)

# kill switch for A/B and debugging: MSRA_TPU_FAST_SIN=0 restores jnp.sin
USE_FAST_SIN = os.environ.get("MSRA_TPU_FAST_SIN", "1") != "0"


def fast_sin(v):
    """sin(v) as a range-reduced degree-7 odd minimax polynomial."""
    q = jnp.round(v * (1.0 / _TWO_PI))
    r = v - q * _TWO_PI  # [-pi, pi]
    r = jnp.where(r > 0.5 * jnp.pi, jnp.pi - r, r)
    r = jnp.where(r < -0.5 * jnp.pi, -jnp.pi - r, r)
    r2 = r * r
    c1, c3, c5, c7 = _SIN_POLY
    return r * (c1 + r2 * (c3 + r2 * (c5 + r2 * c7)))


def trunk_sin(v):
    """The sine used by SIREN/FiLM activation trunks (fast by default)."""
    return fast_sin(v) if USE_FAST_SIN else jnp.sin(v)


def trunk_sin_vjp(v):
    """d trunk_sin(v) / dv — consistent with autodiff of trunk_sin, for
    kernels that hand-write their backward (ops/pallas/film_mlp.py)."""
    if not USE_FAST_SIN:
        return jnp.cos(v)
    q = jnp.round(v * (1.0 / _TWO_PI))
    r = v - q * _TWO_PI
    flip = (r > 0.5 * jnp.pi) | (r < -0.5 * jnp.pi)
    r = jnp.where(r > 0.5 * jnp.pi, jnp.pi - r, r)
    r = jnp.where(r < -0.5 * jnp.pi, -jnp.pi - r, r)
    r2 = r * r
    c1, c3, c5, c7 = _SIN_POLY
    dp = c1 + r2 * (3 * c3 + r2 * (5 * c5 + r2 * (7 * c7)))
    return jnp.where(flip, -dp, dp)


def siren_apply(params, x, w0=30.0):
    return trunk_sin(w0 * (x @ params["w"] + params["b"]))


# ---------------------------------------------------------------------------
# FiLM-Siren layer: sin(w0 * (gamma * (x @ w + b) + beta))
# ---------------------------------------------------------------------------


def film_siren_init(key, in_dim, out_dim, c=6.0, w0=30.0, is_first_layer=False,
                    dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    w_bound = (1.0 / in_dim) if is_first_layer else math.sqrt(c / in_dim) / w0
    b_bound = math.sqrt(1.0 / in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), w_bound, dtype),
        "b": _uniform(kb, (out_dim,), b_bound, dtype),
    }


def film_siren_apply(params, x, gamma, beta, w0=30.0):
    """gamma/beta broadcast against the feature axis; for a batch of
    conditioning vectors pass gamma/beta shaped [B, 1, ..., F] against
    x [B, ..., in]."""
    y = x @ params["w"] + params["b"]
    return trunk_sin(w0 * (gamma * y + beta))


# ---------------------------------------------------------------------------
# Positional encoding (ref: siren/modules.py:53-71, nerf/nerf.py:31-49)
# ---------------------------------------------------------------------------


def positional_encoding(x, length):
    """[sin(2^0 x), cos(2^0 x), sin(2^1 x), ..., cos(2^{L-1} x)] along the last
    axis — interleaved sin/cos per frequency, matching the reference ordering.

    Output dim = x.shape[-1] * 2 * length.  Single fused computation: one
    outer-product against the frequency ladder, then sin+cos — no Python loop
    over frequencies at trace time beyond the static concat list.
    """
    freqs = jnp.asarray([2.0**i for i in range(length)], dtype=x.dtype)
    # [..., L, D]: scaled copies of x per frequency.
    xs = x[..., None, :] * freqs[:, None]
    sin, cos = jnp.sin(xs), jnp.cos(xs)
    # Interleave along the frequency axis -> [..., L, 2, D] -> flatten.
    enc = jnp.stack([sin, cos], axis=-2)
    return enc.reshape(*x.shape[:-1], 2 * length * x.shape[-1])


def positional_encoding_dim(input_dim, length):
    return input_dim * 2 * length
