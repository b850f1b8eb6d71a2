"""Fused FiLM-SIREN trunk Pallas kernel for the pi-GAN generator.

The generator evaluates a 10-layer FiLM-conditioned SIREN MLP on
[batch, rays, samples] point grids (models/pigan.py FilmSirenNeRF).  The VPU
sine is the hard floor (see BASELINE.md), but the XLA path additionally
round-trips every [points, 256] activation through HBM; this kernel streams
per-image point tiles through the whole trunk with weights (+ that image's
film code) resident in VMEM:

  * grid = (batch, point_tiles): each step conditions on ONE image's
    gamma/beta block — FiLM stays a [256]-vector broadcast, never a gathered
    tensor.
  * the rgb-branch view-dir concat (pi_GAN/modules.py:113-115) is split into
    h7 @ W8a + dir @ W8b.
  * backward recomputes the forward per tile (storing the pre-FiLM linear
    outputs u_l, which the film grads need: dgamma_l = sum dv_l * u_l,
    dbeta_l = sum dv_l), accumulating dW/db across the whole grid and
    dfilm per image.

Contract: matches FilmSirenNeRF.apply to fp32 roundoff in interpret mode
(bf16=False); compiled runs use bf16 MXU matmuls (sin stays fp32).

MEASURED VERDICT (v5e, batch 64 x 24576 pts):
  * round 1 (hardware sine): fwd 116 ms vs XLA 105 ms — the trunk was
    VPU-transcendental-bound (~2300 sins/point), fusion could not pay.
  * round 2 (core/nn.fast_sin, the 4.6x polynomial sine, used by BOTH
    paths): fwd 29.6 ms vs XLA 34.3, fwd+bwd 81.5 ms vs XLA 124.9 —
    **1.53x**.  With the sine cheap, the HBM activation round-trips the
    kernel eliminates become the bound, so this IS now the production
    path: models/pigan.py FilmSirenNeRF.apply auto-dispatches here on TPU
    for the standard trunk shape (kill switch MSRA_TPU_FUSED_FILM=0).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import nn

IN_PAD = 8    # [pos(3), dir(3), pad(2)]
HID = 256
OUT_PAD = 8   # [rgb(3), sigma(1), pad(4)]
N_FILM = 9
# Tile sizes are env-tunable for on-chip sweeps (tools/film_modes.py).
# Measured (v5e, stage-1 geometry, tools/film_modes.py): bwd 256 -> 512 cuts
# G fwd+bwd 98 -> 93 ms (the dW/dh matmuls run closer to the chip's measured
# ~115 TFLOP/s chain ceiling); 768 is within noise of 512; 1024 exceeds VMEM.
# 512 divides both progressive-stage point counts exactly (no pad waste).
FWD_TILE = int(os.environ.get("FILM_MLP_FWD_TILE", 256))
BWD_TILE = int(os.environ.get("FILM_MLP_BWD_TILE", 512))
W0_CONST = 30.0


def pack_film_params(params, use_dir: bool):
    """models/pigan.py FilmSirenNeRF params -> padded dense arrays.

    Layer list: input (3->256, consumes film 0), hidden x7 (film 1..7),
    rgb_hidden (256(+3)->256, film 8), sigma head, rgb head.
    """
    def pad_rows(w, rows):
        return jnp.zeros((rows, w.shape[1]), jnp.float32).at[
            : w.shape[0]].set(w)

    out = {
        "W0": pad_rows(params["input"]["w"], IN_PAD),   # pos rows 0..2
        "b0": params["input"]["b"][None],
    }
    for i, p in enumerate(params["hidden"]):
        out[f"W{i + 1}"] = p["w"]
        out[f"b{i + 1}"] = p["b"][None]
    w8 = params["rgb_hidden"]["w"]
    if use_dir:
        out["W8a"] = w8[:HID]
        # dir rows 0..2 of the concat live at kernel input cols 3..5
        W8b = jnp.zeros((IN_PAD, HID), jnp.float32).at[3:6].set(w8[HID:])
        out["W8b"] = W8b
    else:
        out["W8a"] = w8
        out["W8b"] = jnp.zeros((IN_PAD, HID), jnp.float32)
    out["b8"] = params["rgb_hidden"]["b"][None]
    out["Ws"] = jnp.zeros((HID, OUT_PAD), jnp.float32).at[:, :1].set(
        params["sigma"]["w"])
    out["bs"] = jnp.zeros((1, OUT_PAD), jnp.float32).at[:, :1].set(
        params["sigma"]["b"][None])
    out["Wr"] = jnp.zeros((HID, OUT_PAD), jnp.float32).at[:, :3].set(
        params["rgb"]["w"])
    out["br"] = jnp.zeros((1, OUT_PAD), jnp.float32).at[:, :3].set(
        params["rgb"]["b"][None])
    return out


PACK_KEYS = (["W0", "b0"]
             + [f"W{i}" for i in range(1, 8)]
             + [f"b{i}" for i in range(1, 8)]
             + ["W8a", "W8b", "b8", "Ws", "bs", "Wr", "br"])


def _mm(a, b, bf16):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mmT(act, delta, bf16):  # dW = act^T @ delta
    if bf16:
        act = act.astype(jnp.bfloat16)
        delta = delta.astype(jnp.bfloat16)
    return jax.lax.dot_general(act, delta, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mmB(delta, wmat, bf16):  # dh = delta @ W^T
    if bf16:
        delta = delta.astype(jnp.bfloat16)
        wmat = wmat.astype(jnp.bfloat16)
    return jax.lax.dot_general(delta, wmat, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gb(film, layer):
    """film ref content [N_FILM, 2*HID] -> (gamma [1,HID], beta [1,HID]).
    `layer` is a python int (unrolled loop) — static 2D slicing only."""
    row = film[layer:layer + 1]
    return row[:, :HID], row[:, HID:]


def _forward_tile(x, film, w, bf16, store_bf16=False):
    """Returns (acts dict with pre-FiLM u_l and post h_l, rgb, sig)."""
    st = (lambda a: a.astype(jnp.bfloat16)) if store_bf16 else (lambda a: a)
    us, hs = [], []
    h = x
    for l in range(8):
        W, b = w[f"W{l}"], w[f"b{l}"]
        u = _mm(h if l else x, W, bf16) + b
        g, be = _gb(film, l)
        hnew = nn.trunk_sin(W0_CONST * (g * u + be))
        us.append(st(u))
        hs.append(st(hnew))
        h = hnew
    sig = jax.nn.relu(_mm(h, w["Ws"], bf16) + w["bs"])
    u8 = _mm(h, w["W8a"], bf16) + _mm(x, w["W8b"], bf16) + w["b8"]
    g, be = _gb(film, 8)
    h8 = nn.trunk_sin(W0_CONST * (g * u8 + be))
    rgb = jax.nn.sigmoid(_mm(h8, w["Wr"], bf16) + w["br"])
    us.append(st(u8))
    hs.append(st(h8))
    return us, hs, sig, rgb


_N_IN = len(PACK_KEYS)


def _fwd_kernel(bf16, x_ref, film_ref, *refs):
    w = {k: refs[i][:] for i, k in enumerate(PACK_KEYS)}
    out_ref = refs[_N_IN]
    x = x_ref[0]
    film = film_ref[0]
    _, _, sig, rgb = _forward_tile(x, film, w, bf16)
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(lane < 3, rgb, 0.0)
    out = jnp.where(lane == 3, sig[:, 0][:, None], out)
    out_ref[0] = out


def _pad_points(x, tile):
    """Pad axis 1 to a tile multiple."""
    p = x.shape[1]
    pad = (-p) % tile
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


@partial(jax.jit, static_argnames=("bf16", "interpret"))
def _fused_forward(x, film, weights, bf16=True, interpret=False):
    tile = min(FWD_TILE, max(x.shape[1], 8))
    x = _pad_points(x, tile)
    b, p = x.shape[:2]
    n_tiles = p // tile
    in_specs = (
        [pl.BlockSpec((1, tile, IN_PAD), lambda i, j: (i, j, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, N_FILM, 2 * HID), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_IN
    )
    out_specs = pl.BlockSpec((1, tile, OUT_PAD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, bf16),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b, p, OUT_PAD), jnp.float32),
        interpret=interpret,
    )(x, film, *weights)


def _bwd_kernel(bf16, need_dx, x_ref, film_ref, dy_ref, *refs):
    w = {k: refs[i][:] for i, k in enumerate(PACK_KEYS)}
    off = _N_IN
    if need_dx:
        dx_ref = refs[off]
        off += 1
    dfilm_ref = refs[off]
    dw = {k: refs[off + 1 + i] for i, k in enumerate(PACK_KEYS)}

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        for k in PACK_KEYS:
            dw[k][:] = jnp.zeros_like(dw[k])

    @pl.when(j == 0)
    def _():
        dfilm_ref[0] = jnp.zeros_like(dfilm_ref[0])

    x = x_ref[0]
    film = film_ref[0]
    us, hs, sig, rgb = _forward_tile(x, film, w, bf16, store_bf16=bf16)
    dy = dy_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 1)
    drgb = jnp.where(lane < 3, dy, 0.0)
    dsig_scalar = jnp.sum(jnp.where(lane == 3, dy, 0.0), axis=1,
                          keepdims=True)
    dsig = dsig_scalar * (sig[:, :1].astype(jnp.float32) > 0)
    dsig = jnp.pad(dsig, ((0, 0), (0, OUT_PAD - 1)))

    dfilm_rows = [None] * N_FILM

    def film_layer_bwd(l, dh):
        """dh (grad wrt h_l) -> (du_l, dgamma_l, dbeta_l)."""
        u = us[l].astype(jnp.float32)
        g, be = _gb(film, l)
        v = g * u + be
        dv = dh * W0_CONST * nn.trunk_sin_vjp(W0_CONST * v)
        du = dv * g
        dgamma = jnp.sum(dv * u, axis=0, keepdims=True)
        dbeta = jnp.sum(dv, axis=0, keepdims=True)
        dfilm_rows[l] = jnp.concatenate([dgamma, dbeta], axis=1)  # [1, 512]
        return du

    # heads
    dr_pre = drgb * rgb * (1.0 - rgb)
    dw["Wr"][:] += _mmT(hs[8].astype(jnp.float32), dr_pre, bf16)
    dw["br"][:] += jnp.sum(dr_pre, axis=0, keepdims=True)
    dh8 = _mmB(dr_pre, w["Wr"], bf16)
    du8 = film_layer_bwd(8, dh8)
    dw["W8a"][:] += _mmT(hs[7].astype(jnp.float32), du8, bf16)
    dw["W8b"][:] += _mmT(x, du8, bf16)
    dw["b8"][:] += jnp.sum(du8, axis=0, keepdims=True)
    dh7 = _mmB(du8, w["W8a"], bf16)
    # dx only when the caller differentiates wrt points — in generator
    # training x is built from non-diff pose/ray data and stop-gradient'd
    # z values, so the two dx matmuls + the [N, 8] HBM write are dead work
    # (mirrors nerf_mlp's need_dx).
    dx = _mmB(du8, w["W8b"], bf16) if need_dx else None

    dw["Ws"][:] += _mmT(hs[7].astype(jnp.float32), dsig, bf16)
    dw["bs"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dh7 = dh7 + _mmB(dsig, w["Ws"], bf16)

    dh = dh7
    for l in range(7, 0, -1):
        du = film_layer_bwd(l, dh)
        dw[f"W{l}"][:] += _mmT(hs[l - 1].astype(jnp.float32), du, bf16)
        dw[f"b{l}"][:] += jnp.sum(du, axis=0, keepdims=True)
        dh = _mmB(du, w[f"W{l}"], bf16)
    du0 = film_layer_bwd(0, dh)
    dw["W0"][:] += _mmT(x, du0, bf16)
    dw["b0"][:] += jnp.sum(du0, axis=0, keepdims=True)
    if need_dx:
        dx_ref[0] = dx + _mmB(du0, w["W0"], bf16)
    dfilm_ref[0] += jnp.concatenate(dfilm_rows, axis=0)  # [N_FILM, 2*HID]


@partial(jax.jit, static_argnames=("bf16", "interpret", "need_dx"))
def _fused_backward(x, film, dy, weights, bf16=True, interpret=False,
                    need_dx=True):
    p_orig = x.shape[1]
    tile = min(BWD_TILE, max(p_orig, 8))
    x = _pad_points(x, tile)
    dy = _pad_points(dy, tile)
    b, p = x.shape[:2]
    n_tiles = p // tile
    in_specs = (
        [pl.BlockSpec((1, tile, IN_PAD), lambda i, j: (i, j, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, N_FILM, 2 * HID), lambda i, j: (i, 0, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, tile, OUT_PAD), lambda i, j: (i, j, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_IN
    )
    dx_specs = [pl.BlockSpec((1, tile, IN_PAD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)] if need_dx else []
    dx_shapes = ([jax.ShapeDtypeStruct((b, p, IN_PAD), jnp.float32)]
                 if need_dx else [])
    out_specs = (
        dx_specs
        + [pl.BlockSpec((1, N_FILM, 2 * HID), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_IN
    )
    out_shape = (
        dx_shapes
        + [jax.ShapeDtypeStruct((b, N_FILM, 2 * HID), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    )
    outs = pl.pallas_call(
        partial(_bwd_kernel, bf16, need_dx),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, film, dy, *weights)
    if need_dx:
        return outs[0][:, :p_orig], outs[1], outs[2:]
    return None, outs[0], outs[1:]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _prep(params, x, film, use_dir):
    packed = pack_film_params(params, use_dir)
    weights = tuple(packed[k] for k in PACK_KEYS)
    b = film.shape[0]
    flat = x.reshape(b, -1, x.shape[-1])
    p = flat.shape[1]
    # pad up-front to both kernels' tile multiple so their internal pads are
    # identities (mirrors nerf_mlp._prep)
    tile_mult = max(FWD_TILE, BWD_TILE)
    p_pad = -(-p // tile_mult) * tile_mult
    x_pad = jnp.zeros((b, p_pad, IN_PAD), jnp.float32)
    x_pad = x_pad.at[:, :p, :6].set(flat)
    return weights, x_pad, p


def _unpack_grads(dwords, params, use_dir):
    g = dict(zip(PACK_KEYS, dwords))
    out = {
        "input": {"w": g["W0"][:3], "b": g["b0"][0]},
        "hidden": tuple({"w": g[f"W{i}"], "b": g[f"b{i}"][0]}
                        for i in range(1, 8)),
        "sigma": {"w": g["Ws"][:, :1], "b": g["bs"][0, :1]},
        "rgb": {"w": g["Wr"][:, :3], "b": g["br"][0, :3]},
    }
    if use_dir:
        w8 = jnp.concatenate([g["W8a"], g["W8b"][3:6]], axis=0)
    else:
        w8 = g["W8a"]
    out["rgb_hidden"] = {"w": w8, "b": g["b8"][0]}
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_film_apply(params, x, film, use_dir=True, bf16=True,
                     interpret=False, need_dx=True):
    """Drop-in for FilmSirenNeRF.apply: x [B, ..., 6], film [B, 9, 512]
    -> [B, ..., 4].  Differentiable in params, x and film.  need_dx=False
    skips the input-grad matmuls/write in the backward (returns zeros for
    dx) — only for callers whose x provably carries no gradient."""
    weights, x_pad, p = _prep(params, x, film, use_dir)
    out = _fused_forward(x_pad, film, weights, bf16, interpret)
    return out[:, :p, :4].reshape(*x.shape[:-1], 4)


def _fwd_rule(params, x, film, use_dir, bf16, interpret, need_dx):
    return fused_film_apply(params, x, film, use_dir, bf16, interpret,
                            need_dx), (params, x, film)


def _bwd_rule(use_dir, bf16, interpret, need_dx, res, dy):
    params, x, film = res
    weights, x_pad, p = _prep(params, x, film, use_dir)
    b = film.shape[0]
    p_pad = x_pad.shape[1]
    dy_pad = jnp.zeros((b, p_pad, OUT_PAD), jnp.float32)
    dy_pad = dy_pad.at[:, :p, :4].set(dy.reshape(b, -1, 4))
    dx_pad, dfilm, dwords = _fused_backward(x_pad, film, dy_pad, weights,
                                            bf16, interpret, need_dx)
    dx = (dx_pad[:, :p, :6].reshape(x.shape) if need_dx
          else jnp.zeros_like(x))
    return _unpack_grads(dwords, params, use_dir), dx, dfilm


fused_film_apply.defvjp(_fwd_rule, _bwd_rule)
