"""Golden parity against the ACTUAL reference implementation.

Every other ops/model test compares against self-written numpy oracles — a
shared misreading of the reference would pass them (VERDICT r3 missing #4).
These tests import the reference's own torch modules from /root/reference
(read-only) on CPU and assert output-for-output agreement with shared
weights / shared inputs:

  * ops.rays.get_rays            vs nerf/render.py:7-23
  * ops.sampling.sample_pdf      vs nerf/render.py:27-56
  * ops.composite.raw_to_outputs vs nerf/render.py:78-103
  * ops.render.render_rays       vs nerf/render.py:106-147 (deterministic
    jitter: torch.rand patched to the t pattern that reproduces the
    unjittered linspace, which is exactly our perturb=False path)
  * models.nerf NeRF / SirenNeRF forwards vs nerf/nerf.py:52-170
  * models.pigan MappingNetwork / FilmSirenNeRF vs pi_GAN/modules.py:8-118

Weight transport: our params pytrees are copied INTO freshly-built torch
modules (torch Linear weight = our w transposed), the same direction the
LPIPS oracle test uses.  Skipped wholesale if /root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


# ---------------------------------------------------------------------------
# Reference module loading (script dirs, not a package; both experiment dirs
# ship a module literally named `render`, so each load pins sys.modules)
# ---------------------------------------------------------------------------

_LOADED: dict = {}


def _load(path, name, render_dir=None):
    """Load a reference script as a uniquely-named module.  If it does
    `from render import *`, temporarily alias that dir's render.py."""
    if name in _LOADED:
        return _LOADED[name]
    saved = sys.modules.pop("render", None)
    try:
        if render_dir is not None:
            _load(os.path.join(render_dir, "render.py"),
                  f"_ref_render_{os.path.basename(render_dir)}")
            sys.modules["render"] = _LOADED[
                f"_ref_render_{os.path.basename(render_dir)}"]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _LOADED[name] = mod
        return mod
    finally:
        if saved is not None:
            sys.modules["render"] = saved
        elif "render" in sys.modules:
            del sys.modules["render"]


@pytest.fixture(scope="module")
def ref_render():
    return _load(os.path.join(REF, "nerf", "render.py"), "_ref_nerf_render")


@pytest.fixture(scope="module")
def ref_nerf():
    return _load(os.path.join(REF, "nerf", "nerf.py"), "_ref_nerf_nerf")


@pytest.fixture(scope="module")
def ref_pigan():
    # matplotlib import inside modules.py needs a display-free backend
    import matplotlib
    matplotlib.use("Agg", force=True)
    return _load(os.path.join(REF, "pi_GAN", "modules.py"),
                 "_ref_pigan_modules", render_dir=os.path.join(REF, "pi_GAN"))


@pytest.fixture(autouse=True)
def _exact_sine(monkeypatch):
    """Bitwise-faithful trig for the comparison: the production fast_sin
    polynomial (max err 1.8e-6, bounded by its own test) would eat most of
    the 1e-5 budget through an 8-deep sine trunk."""
    from msra_practice_project_tpu.core import nn
    monkeypatch.setattr(nn, "USE_FAST_SIN", False)


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _copy_linear(torch_linear, params):
    """our {'w' [in,out], 'b' [out]} -> torch Linear/Parameter pair."""
    with torch.no_grad():
        torch_linear.weight.copy_(_t(np.asarray(params["w"]).T))
        torch_linear.bias.copy_(_t(params["b"]))


# ---------------------------------------------------------------------------
# ops parity
# ---------------------------------------------------------------------------


def test_get_rays_matches_reference(ref_render):
    from msra_practice_project_tpu.ops import rays as our_rays

    c2w = np.array(our_rays.camera_pose_deg(4.0, 35.0, -25.0))
    ro_ref, rd_ref = ref_render.get_rays(13, 9, 20.0, c2w)
    ro, rd = our_rays.get_rays(13, 9, 20.0, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_ref, atol=1e-6)


def test_sample_pdf_matches_reference(ref_render):
    from msra_practice_project_tpu.ops.sampling import sample_pdf

    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(2.0, 6.0, (32, 17)), axis=-1).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, (32, 16)).astype(np.float32)
    with torch.no_grad():
        ref = ref_render.sample_pdf(_t(bins), _t(weights), 24).numpy()
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 24))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_raw_to_outputs_matches_reference(ref_render):
    from msra_practice_project_tpu.ops.composite import raw_to_outputs

    rng = np.random.default_rng(1)
    raw = rng.normal(size=(16, 24, 4)).astype(np.float32)
    # model-head contract: rgb in [0,1], sigma >= 0 (negative sigma makes
    # exp(-sigma*dist) explode and the comparison measures fp32 cumprod
    # associativity instead of semantics)
    raw[..., :3] = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    raw[..., 3] = np.maximum(raw[..., 3], 0.0)
    z = np.sort(rng.uniform(2.0, 6.0, (16, 24)), axis=-1).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    with torch.no_grad():
        rgb_r, dep_r, acc_r, w_r = ref_render.raw_to_outputs(
            _t(raw), _t(z), _t(d))
    rgb, dep, acc, w = raw_to_outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb), rgb_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep), dep_r.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), acc_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_r.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# model forwards with shared weights
# ---------------------------------------------------------------------------


def _build_torch_nerf(ref_nerf, params, use_siren):
    m = ref_nerf.SirenNeRF() if use_siren else ref_nerf.NeRF()
    for i in range(8):
        _copy_linear(m.layers_pos[i], params["layers_pos"][i])
    for i in range(2):
        _copy_linear(m.layers_dir[i], params["layers_dir"][i])
    _copy_linear(m.output_layer_sigma, params["sigma"])
    _copy_linear(m.output_layer_rgb, params["rgb"])
    return m


@pytest.mark.parametrize("use_siren", [False, True])
def test_nerf_forward_matches_reference(ref_nerf, use_siren):
    from msra_practice_project_tpu.models.nerf import nerf_model

    model = nerf_model(use_siren)
    params = model.init(jax.random.PRNGKey(3))
    tm = _build_torch_nerf(ref_nerf, params, use_siren)

    rng = np.random.default_rng(4)
    x = rng.uniform(-1.5, 1.5, (128, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def test_mapping_network_matches_reference(ref_pigan):
    from msra_practice_project_tpu.models.pigan import (MappingConfig,
                                                        MappingNetwork)

    net = MappingNetwork(MappingConfig())
    params = net.init(jax.random.PRNGKey(5))
    tm = ref_pigan.MappingNetwork(input_dim=256, output_dim=256,
                                  output_layers=8, hidden_dim=256,
                                  hidden_layers=3)
    _copy_linear(tm.input_layer[0], params["trunk"][0])
    # hidden_layers Sequential alternates Linear, LeakyReLU
    lins = [l for l in tm.hidden_layers if isinstance(l, torch.nn.Linear)]
    assert len(lins) == len(params["trunk"]) - 1
    for tl, p in zip(lins, params["trunk"][1:]):
        _copy_linear(tl, p)
    assert len(tm.output_layers) == len(params["heads"]) == 9
    for tl, p in zip(tm.output_layers, params["heads"]):
        _copy_linear(tl, p)

    rng = np.random.default_rng(6)
    z = rng.normal(size=(4, 256)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(z)).numpy()
    ours = np.asarray(net.apply(params, jnp.asarray(z)))
    assert ours.shape == ref_out.shape == (4, 9, 512)
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def _copy_film(torch_film, params):
    with torch.no_grad():
        torch_film.weight.copy_(_t(np.asarray(params["w"]).T))
        torch_film.bias.copy_(_t(params["b"]))


def test_film_siren_nerf_forward_matches_reference(ref_pigan):
    from msra_practice_project_tpu.models.pigan import (FilmSirenNeRF,
                                                        FilmSirenNeRFConfig)

    model = FilmSirenNeRF(FilmSirenNeRFConfig())
    params = model.init(jax.random.PRNGKey(7))
    tm = ref_pigan.FilmSirenNeRF(hidden_dim=256, hidden_layers=8,
                                 use_dir=True)
    _copy_film(tm.input_layer, params["input"])
    assert len(tm.hidden_layers) == len(params["hidden"]) == 7
    for tl, p in zip(tm.hidden_layers, params["hidden"]):
        _copy_film(tl, p)
    _copy_film(tm.hidden_layer_rgb, params["rgb_hidden"])
    _copy_linear(tm.output_layer_sigma[0], params["sigma"])
    _copy_linear(tm.output_layer_rgb[0], params["rgb"])

    rng = np.random.default_rng(8)
    x = rng.uniform(-1.0, 1.0, (96, 6)).astype(np.float32)
    film = rng.normal(1.0, 0.25, (9, 512)).astype(np.float32)
    # reference API: set_film_params chunks each [512] head row into
    # (gamma[256], beta[256]) — pi_GAN/modules.py:96-99
    tm.set_film_params(_t(film))
    with torch.no_grad():
        ref_out = tm(_t(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(film)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


# ---------------------------------------------------------------------------
# full render_rays with shared weights and deterministic jitter
# ---------------------------------------------------------------------------


def test_render_rays_matches_reference(ref_render, ref_nerf, monkeypatch):
    """End-to-end hot loop vs nerf/render.py:106-147.

    The reference always jitters (t_rand = torch.rand).  The t pattern
    [0, 0.5, ..., 0.5, 1] makes `lower + (upper-lower)*t` reproduce the
    unjittered linspace exactly (uniform spacing: midpoint-of-midpoints is
    the original point), which is our perturb=False path — so both sides
    render the same deterministic geometry with no RNG coupling.

    Both sides run in float64 so the comparison proves SEMANTIC equality:
    in fp32, 13-layer matmul chains on two different CPU backends (MKL vs
    XLA:CPU) drift ~1e-4 from rounding alone.  The residual tolerance covers
    the one f32 quantization our path keeps (the linspace z-grid inside
    stratified_samples)."""
    from msra_practice_project_tpu.models.nerf import nerf_model
    from msra_practice_project_tpu.ops.render import render_rays

    n_rays, n_coarse, n_fine = 48, 32, 48
    model = nerf_model(False)
    params32 = model.init(jax.random.PRNGKey(9))
    tm = _build_torch_nerf(ref_nerf, params32, use_siren=False).double()

    t_pat = torch.full((n_rays, n_coarse), 0.5, dtype=torch.float64)
    t_pat[:, 0] = 0.0
    t_pat[:, -1] = 1.0
    monkeypatch.setattr(torch, "rand", lambda *a, **k: t_pat)

    rng = np.random.default_rng(10)
    rays_o = rng.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    rays_d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True) * 0.8

    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        ref_in = torch.tensor(np.stack([rays_o, rays_d], axis=1),
                              dtype=torch.float64)  # [R, 2, 3]
        with torch.no_grad():
            (rgb_c_r, dep_c_r, acc_c_r,
             rgb_f_r, dep_f_r, acc_f_r) = ref_render.render_rays(
                ref_in, 2.0, 6.0, tm, tm, n_coarse, n_fine)
    finally:
        torch.set_default_dtype(prev_default)

    with jax.enable_x64(True):
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                              params32)
        f = model.bound_apply(params)
        out = render_rays(jax.random.PRNGKey(0),
                          jnp.asarray(rays_o, jnp.float64),
                          jnp.asarray(rays_d, jnp.float64), 2.0, 6.0, f, f,
                          n_coarse, n_fine, perturb=False)
        out = {k: np.asarray(v) for k, v in out.items()}
    np.testing.assert_allclose(out["rgb_coarse"], rgb_c_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(out["acc_coarse"], acc_c_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(out["depth_coarse"], dep_c_r.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(out["rgb_fine"], rgb_f_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(out["acc_fine"], acc_f_r.numpy(), atol=1e-5)
    np.testing.assert_allclose(out["depth_fine"], dep_f_r.numpy(), atol=1e-4)


@pytest.fixture(scope="module")
def ref_siren():
    return _load(os.path.join(REF, "siren", "modules.py"),
                 "_ref_siren_modules")


@pytest.mark.parametrize("kind", ["siren", "tanh", "relu", "relu_pe"])
def test_siren_mlp_forward_matches_reference(ref_siren, kind):
    """All four SIREN-zoo backbones vs the reference torch modules with
    shared weights (ref: siren/modules.py:76-152, img factories :154-162)."""
    from msra_practice_project_tpu.models.siren_mlp import img_model

    model = img_model(kind)
    params = model.init(jax.random.PRNGKey(11))
    tm = ref_siren.img_model(kind)
    _copy_linear(tm.input_layer, params["input"])
    for i, p in enumerate(params["hidden"]):
        _copy_linear(tm.hidden_layers[i], p)
    _copy_linear(tm.output_layer, params["output"])

    rng = np.random.default_rng(12)
    x = rng.uniform(-1.0, 1.0, (64, 2)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def _copy_conv(torch_conv, p):
    """our {'w' [O,I,kh,kw], 'b' [O]} -> torch Conv2d (same OIHW layout)."""
    with torch.no_grad():
        torch_conv.weight.copy_(_t(p["w"]))
        torch_conv.bias.copy_(_t(p["b"]))


@pytest.mark.parametrize("res,alpha", [(64, -1.0), (64, 0.3), (32, -1.0),
                                       (16, 0.7)])
def test_discriminator_matches_reference(ref_pigan, res, alpha):
    """Progressive CoordConv discriminator vs the reference with shared
    weights, across ladder entry points and fade-in states (ref:
    pi_GAN/modules.py:258-317)."""
    from msra_practice_project_tpu.models.pigan import Discriminator

    d = Discriminator()
    params = d.init(jax.random.PRNGKey(13))
    tm = ref_pigan.Discriminator(64)
    for i, blk in enumerate(tm.progression_layers):
        p = params["blocks"][i]
        _copy_conv(blk.res_layer, p["res"])
        _copy_conv(blk.layer[0].conv, p["conv1"])
        _copy_conv(blk.layer[2].conv, p["conv2"])
    for i, ad in enumerate(tm.adapter_layers):
        _copy_conv(ad[0], params["adapters"][i])
    _copy_conv(tm.output_layer, params["out"])

    rng = np.random.default_rng(14)
    x = rng.uniform(0.0, 1.0, (4, 3, res, res)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(_t(x), res, alpha).numpy()
    ours = np.asarray(d.apply(params, jnp.asarray(x), res, alpha))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4,
                               err_msg=f"res={res} alpha={alpha}")
