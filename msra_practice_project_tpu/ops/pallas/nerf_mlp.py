"""Fused NeRF-MLP Pallas kernel (forward + custom-VJP backward).

The NeRF hot loop evaluates a 13-matmul MLP on ~260k points per train step
(SURVEY.md §3.1).  The pure-XLA path round-trips every layer activation
through HBM (26 x [N, 256] tensors for fwd+bwd); this kernel keeps ALL
weights (~2.4 MB) resident in VMEM and streams point tiles through the whole
network in one pass:

  * Positional encoding is computed as `sin(x @ F + phase)` — one matmul +
    one transcendental — instead of 2*L slice-wise sin/cos writes; cos(v) is
    encoded as sin(v + pi/2).  The basis F also absorbs the input padding
    (6 -> 8 lanes) and PE padding (60 -> 64, 24 -> 32 lanes).
  * The skip concat [e_pos, h] @ W5 (nerf/nerf.py:84) is split into
    e_pos @ W5a + h @ W5b, avoiding the concat entirely; likewise the
    view-dir concat at the rgb branch (nerf/nerf.py:90).
  * Matmuls run in bf16 with fp32 accumulation (MXU native rate); biases,
    activations-at-rest and outputs stay fp32.
  * The backward kernel recomputes the forward per tile (flash-style) and
    accumulates dW/db across the sequential TPU grid in the output refs,
    plus exact dx through the PE basis.

Numerical contract: matches models/nerf.py apply to ~1e-2 absolute (bf16
matmuls); with bf16=False it matches to fp32 roundoff.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IN_PAD = 8       # [pos(3), dir(3), pad(2)]
PE_POS = 64      # 60 used
PE_DIR = 32      # 24 used
HID = 256
RGB_HID = 128
OUT_PAD = 8      # [rgb(3), sigma(1), pad(4)]
# Tile sizes are env-tunable for on-chip sweeps (tools/roofline_nerf.py).
FWD_TILE = int(os.environ.get("NERF_MLP_FWD_TILE", 768))
BWD_TILE = int(os.environ.get("NERF_MLP_BWD_TILE", 768))
# Scoped-VMEM budget for the kernels (MB).  Mosaic's default scoped limit is
# 16 MB; v5e has 128 MB physical VMEM, so larger tiles are legal if allowed.
VMEM_MB = int(os.environ.get("NERF_MLP_VMEM_MB", 0))


def _compiler_params():
    if VMEM_MB <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_MB * 1024 * 1024)


def _pe_basis(input_offset: int, length: int, width: int):
    """Exact PE as matmuls: freq basis F [IN_PAD, fw] producing the 3*length
    products 2^i * x_d, plus sin/cos placement matrices Ssin/Scos [fw, width]
    scattering them into the reference's interleaved [sin_i(3), cos_i(3)]
    column layout.  pe = sin(x@F) @ Ssin + cos(x@F) @ Scos is then BITWISE
    equal to the reference PE (no sin(v+pi/2) approximation of cos — a 1-ulp
    difference there flips relu masks at the boundary).
    """
    n_freq = 3 * length
    fw = -(-n_freq // 8) * 8  # pad product lanes to a multiple of 8
    F = np.zeros((IN_PAD, fw), np.float32)
    Ssin = np.zeros((fw, width), np.float32)
    Scos = np.zeros((fw, width), np.float32)
    for i in range(length):
        for d in range(3):
            prod = i * 3 + d
            F[input_offset + d, prod] = 2.0**i
            Ssin[prod, i * 6 + d] = 1.0
            Scos[prod, i * 6 + 3 + d] = 1.0
    return F, Ssin, Scos


def _pe_basis_combined():
    """Both PEs in one basis pair: F_ALL [IN_PAD, 48] stacks the pos (32-lane)
    and dir (16-lane) frequency products; S_ALL [96, 96] scatters
    [sin(P) | cos(P)] into [pe_pos(64) | pe_dir(32)] columns in ONE matmul.
    Bitwise-equal to the two _pe_tile calls (each output column still has a
    single 1.0 term), but 6 small matmuls per tile become 2 — measured
    ~0.5-1 ms per fwd pass on 262k points (v5e).
    """
    FP, SP_SIN, SP_COS = _pe_basis(0, 10, PE_POS)
    FD, SD_SIN, SD_COS = _pe_basis(3, 4, PE_DIR)
    nsp, nsd = FP.shape[1], FD.shape[1]
    tot = nsp + nsd
    F_all = np.concatenate([FP, FD], axis=1)                  # [8, 48]
    S_all = np.zeros((2 * tot, PE_POS + PE_DIR), np.float32)  # [96, 96]
    S_all[0:nsp, :PE_POS] = SP_SIN
    S_all[tot:tot + nsp, :PE_POS] = SP_COS
    S_all[nsp:tot, PE_POS:] = SD_SIN
    S_all[tot + nsp:2 * tot, PE_POS:] = SD_COS
    return F_all, S_all


def pack_nerf_params(params):
    """models/nerf.py param pytree -> padded dense arrays for the kernel."""
    lp = params["layers_pos"]
    ld = params["layers_dir"]

    def pad(w, rows, cols):
        return jnp.zeros((rows, cols), jnp.float32).at[
            : w.shape[0], : w.shape[1]].set(w)

    w5 = lp[5]["w"]  # [316, 256] = [60 pe | 256 h]
    w9 = ld[1]["w"]  # [280, 128] = [256 h | 24 pe_dir]
    return dict(
        W0=pad(lp[0]["w"], PE_POS, HID), b0=lp[0]["b"][None],
        W1=lp[1]["w"], b1=lp[1]["b"][None],
        W2=lp[2]["w"], b2=lp[2]["b"][None],
        W3=lp[3]["w"], b3=lp[3]["b"][None],
        W4=lp[4]["w"], b4=lp[4]["b"][None],
        W5a=pad(w5[:60], PE_POS, HID), W5b=w5[60:], b5=lp[5]["b"][None],
        W6=lp[6]["w"], b6=lp[6]["b"][None],
        W7=lp[7]["w"], b7=lp[7]["b"][None],
        W8=ld[0]["w"], b8=ld[0]["b"][None],
        W9a=w9[:HID], W9b=pad(w9[HID:], PE_DIR, RGB_HID),
        b9=ld[1]["b"][None],
        Ws=pad(params["sigma"]["w"], HID, OUT_PAD),
        bs=pad(params["sigma"]["b"][None], 1, OUT_PAD),
        Wr=pad(params["rgb"]["w"], RGB_HID, OUT_PAD),
        br=pad(params["rgb"]["b"][None], 1, OUT_PAD),
    )


PACK_KEYS = ["W0", "b0", "W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4",
             "W5a", "W5b", "b5", "W6", "b6", "W7", "b7", "W8", "b8",
             "W9a", "W9b", "b9", "Ws", "bs", "Wr", "br"]


def _mm(a, b, bf16):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    # NOTE: on compiled Mosaic, an f32 dot lowers to single-pass bf16
    # multiplies anyway (HIGHEST-precision lowering hangs the compiler for
    # these shapes), so compiled fp32 ~ bf16 accuracy; interpret mode (used
    # by the parity tests) is exact fp32.
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _pe_tile_combined(x, F_all, S_all):
    """Both PEs from one freq matmul + one scatter matmul (still exact)."""
    P = _mm(x, F_all, False)
    sc = jnp.concatenate([jnp.sin(P), jnp.cos(P)], axis=1)
    pe = _mm(sc, S_all, False)
    return pe[:, :PE_POS], pe[:, PE_POS:]


def _forward_tile(x, w, bf16, store_bf16=False):
    """Shared forward math on one [T, IN_PAD] tile.  Returns activation dict
    (used both by the fwd kernel and the bwd recompute).

    store_bf16: keep intermediate activations in bf16 (the matmuls consume
    them as bf16 anyway when bf16=True) — halves the recompute VMEM
    footprint, enabling larger backward tiles.
    """
    st = (lambda a: a.astype(jnp.bfloat16)) if store_bf16 else (lambda a: a)
    pe_p, pe_d = _pe_tile_combined(x, w["F_all"], w["S_all"])
    pe_p, pe_d = st(pe_p), st(pe_d)
    h0 = st(jax.nn.relu(_mm(pe_p, w["W0"], bf16) + w["b0"]))
    h1 = st(jax.nn.relu(_mm(h0, w["W1"], bf16) + w["b1"]))
    h2 = st(jax.nn.relu(_mm(h1, w["W2"], bf16) + w["b2"]))
    h3 = st(jax.nn.relu(_mm(h2, w["W3"], bf16) + w["b3"]))
    h4 = st(jax.nn.relu(_mm(h3, w["W4"], bf16) + w["b4"]))
    h5 = st(jax.nn.relu(_mm(pe_p, w["W5a"], bf16)
                        + _mm(h4, w["W5b"], bf16) + w["b5"]))
    h6 = st(jax.nn.relu(_mm(h5, w["W6"], bf16) + w["b6"]))
    h7 = st(jax.nn.relu(_mm(h6, w["W7"], bf16) + w["b7"]))
    sig = jax.nn.relu(_mm(h7, w["Ws"], bf16) + w["bs"])
    hd = st(_mm(h7, w["W8"], bf16) + w["b8"])
    h9 = st(jax.nn.relu(_mm(hd, w["W9a"], bf16)
                        + _mm(pe_d, w["W9b"], bf16) + w["b9"]))
    rgb = jax.nn.sigmoid(_mm(h9, w["Wr"], bf16) + w["br"])
    return dict(pe_p=pe_p, pe_d=pe_d, h0=h0, h1=h1, h2=h2, h3=h3, h4=h4,
                h5=h5, h6=h6, h7=h7, sig=sig, hd=hd, h9=h9, rgb=rgb)


def _stage_specs(w, bf16):
    """The forward as (mxu, epi) stage pairs for the software-pipelined
    kernel (VERDICT r3 #6): ``mxu(env) -> pre`` is the MXU work of a stage
    (matmuls only), ``epi(env, pre)`` the VPU epilogue (bias/relu/sin/
    sigmoid/cast) writing the stage output into ``env``.  Splitting the two
    lets the kernel interleave chain A's epilogues between chain B's matmul
    issues in PROGRAM ORDER — the co-scheduling neither Mosaic nor XLA
    found when merely offered independent chains (BASELINE r3 addendum).
    Values are bitwise-identical to _forward_tile(store_bf16=bf16)."""
    st = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)

    def dense(src, wk, bk, out):
        def mxu(env, _w=wk):
            return _mm(env[src], w[_w], bf16)

        def epi(env, pre, _b=bk, _o=out):
            env[_o] = st(jax.nn.relu(pre + w[_b]))
        return mxu, epi

    def pe0_epi(env, pre):
        env["sc"] = jnp.concatenate([jnp.sin(pre), jnp.cos(pre)], axis=1)

    def pe1_epi(env, pre):
        env["pe_p"] = st(pre[:, :PE_POS])
        env["pe_d"] = st(pre[:, PE_POS:])

    def skip_mxu(env):
        return _mm(env["pe_p"], w["W5a"], bf16) + _mm(env["h4"], w["W5b"],
                                                      bf16)

    def skip_epi(env, pre):
        env["h5"] = st(jax.nn.relu(pre + w["b5"]))

    def heads_mxu(env):
        return (_mm(env["h7"], w["Ws"], bf16), _mm(env["h7"], w["W8"], bf16))

    def heads_epi(env, pre):
        env["sig"] = jax.nn.relu(pre[0] + w["bs"])
        env["hd"] = st(pre[1] + w["b8"])

    def dir_mxu(env):
        return _mm(env["hd"], w["W9a"], bf16) + _mm(env["pe_d"], w["W9b"],
                                                    bf16)

    def dir_epi(env, pre):
        env["h9"] = st(jax.nn.relu(pre + w["b9"]))

    def rgb_epi(env, pre):
        env["rgb"] = jax.nn.sigmoid(pre + w["br"])

    return (
        [(lambda env: _mm(env["x"], w["F_all"], False), pe0_epi),
         (lambda env: _mm(env["sc"], w["S_all"], False), pe1_epi),
         dense("pe_p", "W0", "b0", "h0")]
        + [dense(f"h{i - 1}", f"W{i}", f"b{i}", f"h{i}") for i in range(1, 5)]
        + [(skip_mxu, skip_epi),
           dense("h5", "W6", "b6", "h6"),
           dense("h6", "W7", "b7", "h7"),
           (heads_mxu, heads_epi),
           (dir_mxu, dir_epi),
           (lambda env: _mm(env["h9"], w["Wr"], bf16), rgb_epi)]
    )


def _forward_tile_pipelined(xA, xB, w, bf16):
    """Run two half-tiles through _stage_specs with a half-stage stagger:
    the instruction stream is  epiA(s-1), mxuA(s), epiB(s-1), mxuB(s)  —
    every matmul issue is immediately followed by the OTHER chain's
    already-satisfied epilogue, giving the VLIW scheduler VPU work to
    co-issue under each MXU pass."""
    specs = _stage_specs(w, bf16)
    envA, envB = {"x": xA}, {"x": xB}
    preA = specs[0][0](envA)
    preB = specs[0][0](envB)
    for s in range(1, len(specs)):
        specs[s - 1][1](envA, preA)
        preA = specs[s][0](envA)
        specs[s - 1][1](envB, preB)
        preB = specs[s][0](envB)
    specs[-1][1](envA, preA)
    specs[-1][1](envB, preB)
    return envA, envB


def _out_mask(env):
    rgb = env["rgb"].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(lane < 3, rgb, 0.0)
    return jnp.where(lane == 3, env["sig"][:, 0].astype(jnp.float32)[:, None],
                     out)


PE_NAMES = ["F_all", "S_all"]
_N_W = len(PE_NAMES) + len(PACK_KEYS)


def _fwd_kernel(bf16, *refs):
    x_ref = refs[0]
    names = PE_NAMES + PACK_KEYS
    w = {k: refs[1 + i][:] for i, k in enumerate(names)}
    out_ref = refs[1 + _N_W]
    acts = _forward_tile(x_ref[:], w, bf16)
    # out = [rgb(3), sigma(1), pad]: rgb head already padded to OUT_PAD with
    # zero weight cols -> cols 3.. of rgb are sigmoid(0)=0.5; mask them and
    # place sigma from its padded head (col 0 of sig).
    lane = jax.lax.broadcasted_iota(jnp.int32, acts["rgb"].shape, 1)
    out = jnp.where(lane < 3, acts["rgb"], 0.0)
    out = jnp.where(lane == 3, acts["sig"][:, 0][:, None], out)
    out_ref[:] = out


def _fwd_kernel_pipelined(bf16, half, *refs):
    """Software-pipelined forward: the tile is two half-row chains whose
    stages are interleaved in program order (see _forward_tile_pipelined)."""
    x_ref = refs[0]
    names = PE_NAMES + PACK_KEYS
    w = {k: refs[1 + i][:] for i, k in enumerate(names)}
    out_ref = refs[1 + _N_W]
    envA, envB = _forward_tile_pipelined(x_ref[:half], x_ref[half:], w, bf16)
    out_ref[:half] = _out_mask(envA)
    out_ref[half:] = _out_mask(envB)


# ---------------------------------------------------------------------------
# Saved-activations variant: the fwd kernel spills the per-point activations
# (bf16) to HBM so the backward skips its forward recompute entirely.
# Traffic: ~[N, 2560] bf16 each way (~1.3 GB/step at the bench geometry,
# overlappable with compute at 819 GB/s) vs ~1 extra fwd pass of MXU time.
# ---------------------------------------------------------------------------

ACT_SLOTS = ([("pe_p", PE_POS), ("pe_d", PE_DIR)]
             + [(f"h{i}", HID) for i in range(8)]
             + [("hd", HID), ("h9", RGB_HID)])
ACT_W = sum(w for _, w in ACT_SLOTS)          # 2528
ACT_PAD = -(-ACT_W // 128) * 128              # 2560 (lane-aligned)
_ACT_OFFS = {}
_o = 0
for _name, _w in ACT_SLOTS:
    _ACT_OFFS[_name] = (_o, _o + _w)
    _o += _w


def _pack_acts(acts, bf16):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    parts = [acts[name].astype(dt) for name, _ in ACT_SLOTS]
    packed = jnp.concatenate(parts, axis=1)
    return jnp.pad(packed, ((0, 0), (0, ACT_PAD - ACT_W)))


def _unpack_acts(flat):
    return {name: flat[:, o0:o1] for name, (o0, o1) in _ACT_OFFS.items()}


def _fwd_save_kernel(bf16, *refs):
    x_ref = refs[0]
    names = PE_NAMES + PACK_KEYS
    w = {k: refs[1 + i][:] for i, k in enumerate(names)}
    out_ref = refs[1 + _N_W]
    act_ref = refs[2 + _N_W]
    # store_bf16=bf16: the saved values are exactly what the recompute-based
    # backward would have rebuilt, so gradients are unchanged.
    acts = _forward_tile(x_ref[:], w, bf16, store_bf16=bf16)
    lane = jax.lax.broadcasted_iota(jnp.int32, acts["rgb"].shape, 1)
    out = jnp.where(lane < 3, acts["rgb"].astype(jnp.float32), 0.0)
    out = jnp.where(lane == 3,
                    acts["sig"][:, 0].astype(jnp.float32)[:, None], out)
    out_ref[:] = out
    act_ref[:] = _pack_acts(acts, bf16)


def _bwd_saved_kernel(bf16, need_dx, *refs):
    x_ref = refs[0]
    names = PE_NAMES + PACK_KEYS
    w = {k: refs[1 + i][:] for i, k in enumerate(names)}
    dy_ref = refs[1 + _N_W]
    act_ref = refs[2 + _N_W]
    off = 3 + _N_W
    if need_dx:
        dx_ref = refs[off]
        off += 1
    dword = {k: refs[off + i] for i, k in enumerate(PACK_KEYS)}

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for k in PACK_KEYS:
            dword[k][:] = jnp.zeros_like(dword[k])

    a = _unpack_acts(act_ref[:])
    # heads are cheap to rebuild from saved h7/h9 (two small matmuls)
    a["sig"] = jax.nn.relu(_mm(a["h7"], w["Ws"], bf16) + w["bs"])
    a["rgb"] = jax.nn.sigmoid(_mm(a["h9"], w["Wr"], bf16) + w["br"])
    _grad_body(bf16, need_dx, x_ref[:], a, w, dy_ref[:], dword,
               dx_ref if need_dx else None)


def _grid_specs(n_tiles, tile):
    names_in = [
        pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_W
    out_spec = pl.BlockSpec((tile, OUT_PAD), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.GridSpec(grid=(n_tiles,), in_specs=names_in,
                       out_specs=out_spec)


def _pad_rows(arr, tile):
    n = arr.shape[0]
    pad = (-n) % tile
    if pad == 0:
        return arr
    return jnp.pad(arr, ((0, pad), (0, 0)))


@partial(jax.jit, static_argnames=("bf16", "interpret", "tile", "pipe"))
def _fused_forward(x_pad, weights, bf16=True, interpret=False, tile=None,
                   pipe=False):
    n = x_pad.shape[0]
    tile = min(tile or FWD_TILE, max(n, 8))
    if pipe:
        tile = max(tile - tile % 16, 16)  # two row-aligned half-chains
    x_pad = _pad_rows(x_pad, tile)
    n_tiles = x_pad.shape[0] // tile
    kern = (partial(_fwd_kernel_pipelined, bf16, tile // 2) if pipe
            else partial(_fwd_kernel, bf16))
    out = pl.pallas_call(
        kern,
        grid_spec=_grid_specs(n_tiles, tile),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], OUT_PAD),
                                       jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_pad, *weights)
    return out[:n]


@partial(jax.jit, static_argnames=("bf16", "interpret", "tile"))
def _fused_forward_save(x_pad, weights, bf16=True, interpret=False,
                        tile=None):
    """Forward that also spills packed activations for the backward."""
    n = x_pad.shape[0]
    tile = min(tile or FWD_TILE, max(n, 8))
    x_pad = _pad_rows(x_pad, tile)
    n_pad = x_pad.shape[0]
    n_tiles = n_pad // tile
    gs = _grid_specs(n_tiles, tile)
    act_dt = jnp.bfloat16 if bf16 else jnp.float32
    out, acts = pl.pallas_call(
        partial(_fwd_save_kernel, bf16),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,), in_specs=gs.in_specs,
            out_specs=[
                gs.out_specs,
                pl.BlockSpec((tile, ACT_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, OUT_PAD), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, ACT_PAD), act_dt),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_pad, *weights)
    return out[:n], acts


@partial(jax.jit,
         static_argnames=("bf16", "interpret", "need_dx", "tile"))
def _fused_backward_saved(x_pad, weights, dy, acts, bf16=True,
                          interpret=False, need_dx=True, tile=None):
    """Backward from saved activations — no forward recompute."""
    n = x_pad.shape[0]
    tile = min(tile or BWD_TILE, max(n, 8))
    x_pad = _pad_rows(x_pad, tile)
    dy = _pad_rows(dy, tile)
    acts = _pad_rows(acts, tile)
    n_pad = x_pad.shape[0]
    n_tiles = n_pad // tile
    w_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                for w in weights[len(PE_NAMES):]]
    in_specs = (
        [pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_W
        + [pl.BlockSpec((tile, OUT_PAD), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((tile, ACT_PAD), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    )
    dx_specs = ([pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if need_dx else [])
    out_specs = (
        dx_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(PACK_KEYS)
    )
    out_shape = (([jax.ShapeDtypeStruct((n_pad, IN_PAD), jnp.float32)]
                  if need_dx else []) + w_shapes)
    outs = pl.pallas_call(
        partial(_bwd_saved_kernel, bf16, need_dx),
        grid_spec=pl.GridSpec(grid=(n_tiles,), in_specs=in_specs,
                              out_specs=out_specs),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_pad, *weights, dy, acts)
    if need_dx:
        return outs[0][:n], outs[1:]
    return None, outs


# ---------------------------------------------------------------------------
# Backward kernel: recompute + accumulate dW across the sequential grid.
# ---------------------------------------------------------------------------


def _bwd_kernel(bf16, need_dx, *refs):
    x_ref = refs[0]
    names = PE_NAMES + PACK_KEYS
    w = {k: refs[1 + i][:] for i, k in enumerate(names)}
    dy_ref = refs[1 + _N_W]
    # outputs: dx (only when need_dx — in the train step the points are
    # functions of non-differentiable ray data and stop-gradient'd z values,
    # so the whole PE-backward block is dead work), then d<param> per
    # PACK_KEY.
    off = 2 + _N_W
    if need_dx:
        dx_ref = refs[off]
        off += 1
    dword = {k: refs[off + i] for i, k in enumerate(PACK_KEYS)}

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for k in PACK_KEYS:
            dword[k][:] = jnp.zeros_like(dword[k])

    x = x_ref[:]
    a = _forward_tile(x, w, bf16, store_bf16=bf16)
    _grad_body(bf16, need_dx, x, a, w, dy_ref[:], dword,
               dx_ref if need_dx else None)


def _grad_body(bf16, need_dx, x, a, w, dy, dword, dx_ref):
    """Shared backward math: activations `a` -> accumulate dW/db (+ dx)."""

    def mmT_acc(act, delta):  # dW = act^T @ delta
        lhs = act.astype(jnp.bfloat16) if bf16 else act
        rhs = delta.astype(jnp.bfloat16) if bf16 else delta
        return jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mmB(delta, wmat):  # dh = delta @ W^T
        lhs = delta.astype(jnp.bfloat16) if bf16 else delta
        rhs = (wmat.astype(jnp.bfloat16) if bf16 else wmat)
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def relu_mask(act):  # Mosaic lacks bf16 comparisons on this target
        return act.astype(jnp.float32) > 0

    lane = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 1)
    drgb = jnp.where(lane < 3, dy, 0.0)
    dsig_col = jnp.where(lane == 3, dy, 0.0)  # sigma grad sits in col 3
    # route sigma grad to col 0 of the padded sigma head
    dsig = jnp.sum(dsig_col, axis=1, keepdims=True) * relu_mask(a["sig"][:, :1])
    dsig = jnp.pad(dsig, ((0, 0), (0, OUT_PAD - 1)))

    dr_pre = drgb * a["rgb"] * (1.0 - a["rgb"])
    dword["Wr"][:] += mmT_acc(a["h9"], dr_pre)
    dword["br"][:] += jnp.sum(dr_pre, axis=0, keepdims=True)
    dh9 = mmB(dr_pre, w["Wr"]) * relu_mask(a["h9"])

    dword["W9a"][:] += mmT_acc(a["hd"], dh9)
    dword["W9b"][:] += mmT_acc(a["pe_d"], dh9)
    dword["b9"][:] += jnp.sum(dh9, axis=0, keepdims=True)
    dhd = mmB(dh9, w["W9a"])
    dpe_d = mmB(dh9, w["W9b"]) if need_dx else None

    dword["Ws"][:] += mmT_acc(a["h7"], dsig)
    dword["W8"][:] += mmT_acc(a["h7"], dhd)
    dword["bs"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dword["b8"][:] += jnp.sum(dhd, axis=0, keepdims=True)
    dh7 = (mmB(dsig, w["Ws"]) + mmB(dhd, w["W8"])) * relu_mask(a["h7"])

    dword["W7"][:] += mmT_acc(a["h6"], dh7)
    dword["b7"][:] += jnp.sum(dh7, axis=0, keepdims=True)
    dh6 = mmB(dh7, w["W7"]) * relu_mask(a["h6"])

    dword["W6"][:] += mmT_acc(a["h5"], dh6)
    dword["b6"][:] += jnp.sum(dh6, axis=0, keepdims=True)
    dh5 = mmB(dh6, w["W6"]) * relu_mask(a["h5"])

    dword["W5a"][:] += mmT_acc(a["pe_p"], dh5)
    dword["W5b"][:] += mmT_acc(a["h4"], dh5)
    dword["b5"][:] += jnp.sum(dh5, axis=0, keepdims=True)
    dpe_p = mmB(dh5, w["W5a"]) if need_dx else None
    dh4 = mmB(dh5, w["W5b"]) * relu_mask(a["h4"])

    dword["W4"][:] += mmT_acc(a["h3"], dh4)
    dword["b4"][:] += jnp.sum(dh4, axis=0, keepdims=True)
    dh3 = mmB(dh4, w["W4"]) * relu_mask(a["h3"])

    dword["W3"][:] += mmT_acc(a["h2"], dh3)
    dword["b3"][:] += jnp.sum(dh3, axis=0, keepdims=True)
    dh2 = mmB(dh3, w["W3"]) * relu_mask(a["h2"])

    dword["W2"][:] += mmT_acc(a["h1"], dh2)
    dword["b2"][:] += jnp.sum(dh2, axis=0, keepdims=True)
    dh1 = mmB(dh2, w["W2"]) * relu_mask(a["h1"])

    dword["W1"][:] += mmT_acc(a["h0"], dh1)
    dword["b1"][:] += jnp.sum(dh1, axis=0, keepdims=True)
    dh0 = mmB(dh1, w["W1"]) * relu_mask(a["h0"])

    dword["W0"][:] += mmT_acc(a["pe_p"], dh0)
    dword["b0"][:] += jnp.sum(dh0, axis=0, keepdims=True)

    if not need_dx:
        return
    dpe_p += mmB(dh0, w["W0"])

    # back through the combined PE: pe = [sin(P)|cos(P)] @ S_all, P = x@F_all
    P = _mm(x, w["F_all"], False)
    dpe = jnp.concatenate([dpe_p, dpe_d], axis=1)          # [T, 96]
    dsc = jax.lax.dot_general(dpe, w["S_all"], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    half = P.shape[1]
    dP = dsc[:, :half] * jnp.cos(P) - dsc[:, half:] * jnp.sin(P)
    dx_ref[:] = jax.lax.dot_general(dP, w["F_all"], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)


@partial(jax.jit,
         static_argnames=("bf16", "interpret", "need_dx", "tile"))
def _fused_backward(x_pad, weights, dy, bf16=True, interpret=False,
                    need_dx=True, tile=None):
    n = x_pad.shape[0]
    tile = min(tile or BWD_TILE, max(n, 8))
    x_pad = _pad_rows(x_pad, tile)
    dy = _pad_rows(dy, tile)
    n_pad = x_pad.shape[0]
    n_tiles = n_pad // tile
    w_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                for w in weights[len(PE_NAMES):]]
    in_specs = (
        [pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_W
        + [pl.BlockSpec((tile, OUT_PAD), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    )
    dx_specs = ([pl.BlockSpec((tile, IN_PAD), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] if need_dx else [])
    out_specs = (
        dx_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(PACK_KEYS)
    )
    out_shape = (([jax.ShapeDtypeStruct((n_pad, IN_PAD), jnp.float32)]
                  if need_dx else []) + w_shapes)
    outs = pl.pallas_call(
        partial(_bwd_kernel, bf16, need_dx),
        grid_spec=pl.GridSpec(grid=(n_tiles,), in_specs=in_specs,
                              out_specs=out_specs),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_pad, *weights, dy)
    if need_dx:
        return outs[0][:n], outs[1:]
    return None, outs


# ---------------------------------------------------------------------------
# custom_vjp wrapper operating on the model's param pytree
# ---------------------------------------------------------------------------


_F_ALL, _S_ALL = _pe_basis_combined()


_W_KEYS = frozenset(k for k in PACK_KEYS if k.startswith("W"))


def _prep(params, x, bf16=False):
    """Pack params + pad points; returns (weights tuple, x_pad, n, shape).

    bf16=True pre-casts the matmul weight matrices (not biases, not the
    exact-PE basis) to bf16 outside the kernel — same rounding as the
    kernels' own per-use casts, so results are bitwise identical.  Measured
    speed effect is nil (Mosaic hoists the loop-invariant casts), but it
    halves the weights' VMEM footprint (2.4 -> 1.3 MB), headroom the tile
    sweeps use.
    """
    packed = pack_nerf_params(params)
    if bf16:
        packed = {k: (v.astype(jnp.bfloat16) if k in _W_KEYS else v)
                  for k, v in packed.items()}
    weights = tuple(jnp.asarray(a) for a in (_F_ALL, _S_ALL)) + \
        tuple(packed[k] for k in PACK_KEYS)
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    n = flat.shape[0]
    # pad up-front to the kernels' tile multiple so the per-kernel
    # _pad_rows/unpad slices are identities (extra pads cost ~2 ms/step)
    tile_mult = max(FWD_TILE, BWD_TILE)
    n_pad = -(-n // tile_mult) * tile_mult
    x_pad = jnp.zeros((n_pad, IN_PAD), jnp.float32)
    x_pad = x_pad.at[:n, :6].set(flat)
    return weights, x_pad, n, shape


def _unpack_grads(dw, params):
    """Padded dense grads -> model param pytree grads."""
    g = dict(zip(PACK_KEYS, dw))
    lp = params["layers_pos"]
    dlp = (
        {"w": g["W0"][:60], "b": g["b0"][0]},
        {"w": g["W1"], "b": g["b1"][0]},
        {"w": g["W2"], "b": g["b2"][0]},
        {"w": g["W3"], "b": g["b3"][0]},
        {"w": g["W4"], "b": g["b4"][0]},
        {"w": jnp.concatenate([g["W5a"][:60], g["W5b"]], axis=0),
         "b": g["b5"][0]},
        {"w": g["W6"], "b": g["b6"][0]},
        {"w": g["W7"], "b": g["b7"][0]},
    )
    dld = (
        {"w": g["W8"], "b": g["b8"][0]},
        {"w": jnp.concatenate([g["W9a"], g["W9b"][:24]], axis=0),
         "b": g["b9"][0]},
    )
    return {
        "layers_pos": dlp,
        "layers_dir": dld,
        "sigma": {"w": g["Ws"][:, :1], "b": g["bs"][0, :1]},
        "rgb": {"w": g["Wr"][:, :3], "b": g["br"][0, :3]},
    }


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_nerf_apply(params, x, bf16=True, interpret=False, need_dx=True,
                     save_acts=False):
    """Drop-in replacement for models/nerf.py NeRFModel.apply (PE variant).

    x [..., 6] -> [..., 4].  Differentiable in params, and in x when
    need_dx=True.  With need_dx=False the backward kernel skips the whole
    PE-backward block (2x sin + 2x cos + 6 matmuls per tile) and returns
    ZERO input gradients — only valid when x carries no gradient (the NeRF
    train step: points are built from ray data and stop-gradient'd z).

    save_acts=True: under differentiation, the forward spills packed bf16
    activations to HBM and the backward consumes them instead of
    recomputing the forward — trades ~1.3 GB/step of overlappable HBM
    traffic for a full fwd pass of MXU time.  Gradients are identical (the
    saved values are bit-equal to what the recompute would rebuild).
    """
    weights, x_pad, n, shape = _prep(params, x, bf16)
    out = _fused_forward(x_pad, weights, bf16, interpret)
    return out[:n, :4].reshape(*shape[:-1], 4)


def _fwd_rule(params, x, bf16, interpret, need_dx, save_acts):
    if not save_acts:
        out = fused_nerf_apply(params, x, bf16, interpret, need_dx,
                               save_acts)
        return out, (params, x, None)
    weights, x_pad, n, shape = _prep(params, x, bf16)
    out, acts = _fused_forward_save(x_pad, weights, bf16, interpret)
    return out[:n, :4].reshape(*shape[:-1], 4), (params, x, acts)


def _bwd_rule(bf16, interpret, need_dx, save_acts, res, dy):
    params, x, acts = res
    weights, x_pad, n, shape = _prep(params, x, bf16)
    dy_flat = dy.reshape(-1, 4)
    n_pad = x_pad.shape[0]
    dy_pad = jnp.zeros((n_pad, OUT_PAD), jnp.float32).at[:n, :4].set(dy_flat)
    if save_acts:
        dx_pad, dw = _fused_backward_saved(x_pad, weights, dy_pad, acts,
                                           bf16, interpret, need_dx)
    else:
        dx_pad, dw = _fused_backward(x_pad, weights, dy_pad, bf16, interpret,
                                     need_dx)
    dx = (dx_pad[:n, :6].reshape(shape) if need_dx
          else jnp.zeros(shape, x.dtype))
    return _unpack_grads(dw, params), dx


fused_nerf_apply.defvjp(_fwd_rule, _bwd_rule)
