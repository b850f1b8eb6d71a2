"""Model zoo tests: shapes, output ranges, init parity, param counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msra_practice_project_tpu.models import nerf, pigan, siren_mlp


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


# ---------------------------------------------------------------------------
# siren MLP zoo
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["siren", "tanh", "relu", "relu_pe"])
def test_img_model_forward(kind):
    model = siren_mlp.img_model(kind)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=-1,
                           maxval=1)
    y = model.apply(params, x)
    assert y.shape == (64, 1)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("kind", ["siren", "tanh", "relu", "relu_pe"])
def test_sdf_model_forward(kind):
    model = siren_mlp.sdf_model(kind)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1,
                           maxval=1)
    assert model.apply(params, x).shape == (32, 1)


def test_mlp_param_counts():
    """3 hidden layers x 256 wide (ref: siren/modules.py:154-162)."""
    model = siren_mlp.img_model("siren")
    params = model.init(jax.random.PRNGKey(0))
    # in(2->256) + 3x(256->256) + out(256->1)
    want = (2 * 256 + 256) + 3 * (256 * 256 + 256) + (256 * 1 + 1)
    assert n_params(params) == want


def test_siren_output_distribution():
    """SIREN init keeps activations well-distributed (no saturation)."""
    model = siren_mlp.img_model("siren")
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4096, 2), minval=-1,
                           maxval=1)
    y = np.asarray(model.apply(params, x))
    assert 0.01 < y.std() < 10.0


# ---------------------------------------------------------------------------
# NeRF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_siren", [False, True])
def test_nerf_forward_contract(use_siren):
    model = nerf.nerf_model(use_siren)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 9, 6))
    out = model.apply(params, x)
    assert out.shape == (17, 9, 4)
    o = np.asarray(out)
    assert (o[..., :3] >= 0).all() and (o[..., :3] <= 1).all()  # sigmoid rgb
    assert (o[..., 3] >= 0).all()                                # relu sigma


def test_nerf_param_count():
    """Match the reference topology parameter count exactly.

    Trunk (nerf/nerf.py:58-67): 60->256, 4x 256->256, 316->256, 2x 256->256;
    dir branch: 256->256 linear, 280->128; heads: 256->1, 128->3.
    """
    model = nerf.nerf_model(False)
    params = model.init(jax.random.PRNGKey(0))
    dims = [(60, 256), (256, 256), (256, 256), (256, 256), (256, 256),
            (316, 256), (256, 256), (256, 256), (256, 256), (280, 128),
            (256, 1), (128, 3)]
    want = sum(i * o + o for i, o in dims)
    assert n_params(params) == want


def test_nerf_view_dependence():
    """rgb must depend on direction, sigma must NOT (architecture property)."""
    model = nerf.nerf_model(False)
    params = model.init(jax.random.PRNGKey(0))
    pos = jnp.array([[0.3, -0.2, 0.5]])
    d1 = jnp.array([[0.0, 0.0, -1.0]])
    d2 = jnp.array([[1.0, 0.0, 0.0]])
    o1 = model.apply(params, jnp.concatenate([pos, d1], -1))
    o2 = model.apply(params, jnp.concatenate([pos, d2], -1))
    assert np.allclose(o1[..., 3], o2[..., 3])          # sigma invariant
    assert not np.allclose(o1[..., :3], o2[..., :3])    # rgb varies


# ---------------------------------------------------------------------------
# pi-GAN
# ---------------------------------------------------------------------------


def test_mapping_network_shapes_and_film_bias():
    m = pigan.MappingNetwork(pigan.MappingConfig(input_dim=1024))
    params = m.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 1024))
    film = m.apply(params, z)
    assert film.shape == (4, 9, 512)
    # gamma bias init 1, beta bias init 0 (pi_GAN/modules.py:55-58): with z~N
    # and leaky-relu trunk, mean(gamma) should sit near 1, mean(beta) near 0.
    f = np.asarray(film)
    assert abs(f[..., :256].mean() - 1.0) < 0.5
    assert abs(f[..., 256:].mean()) < 0.5


@pytest.mark.parametrize("use_dir", [True, False])
def test_film_siren_nerf_forward(use_dir):
    t = pigan.FilmSirenNeRF(pigan.FilmSirenNeRFConfig(use_dir=use_dir))
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 7, 6))
    film = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 512)) * 0.1 + \
        jnp.concatenate([jnp.ones((2, 9, 256)), jnp.zeros((2, 9, 256))], -1)
    out = t.apply(params, x, film)
    assert out.shape == (2, 5, 7, 4)
    o = np.asarray(out)
    assert (o[..., :3] >= 0).all() and (o[..., :3] <= 1).all()
    assert (o[..., 3] >= 0).all()


def test_film_conditioning_changes_output():
    t = pigan.FilmSirenNeRF()
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 6))
    base = jnp.concatenate([jnp.ones((1, 9, 256)), jnp.zeros((1, 9, 256))], -1)
    o1 = t.apply(params, x, base)
    o2 = t.apply(params, x, base + 0.3)
    assert not np.allclose(o1, o2)


def test_generator_end_to_end_small():
    cfg = pigan.GeneratorConfig(z_dim=64, resolution=8, coarse_samples=4,
                                fine_samples=4)
    g = pigan.Generator(cfg)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    imgs = g.apply(params, jax.random.PRNGKey(2), z)
    assert imgs.shape == (3, 3, 8, 8)
    im = np.asarray(imgs)
    assert (im >= 0).all() and (im <= 1).all()
    # different latents give different images
    assert not np.allclose(im[0], im[1])


def test_generator_batched_equals_single():
    """The vmapped batch render must equal per-sample renders at fixed pose."""
    cfg = pigan.GeneratorConfig(z_dim=32, resolution=8, coarse_samples=4,
                                fine_samples=4)
    g = pigan.Generator(cfg)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    film = g.get_mapping(params, z)
    theta = jnp.zeros((2,))
    phi = jnp.zeros((2,))
    key = jax.random.PRNGKey(3)
    both = g.render_film(params, key, film, theta, phi)
    one0 = g.render_film(params, key, film[:1], theta[:1], phi[:1])
    # Same pose, same film -> same image regardless of batch context.
    # (RNG for stratified jitter is shared across the batch dimension.)
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(one0[0]),
                               atol=1e-4)


# resolution 2 would index adapter[5] which doesn't exist — same bound as the
# reference (pi_GAN/modules.py:292-298,307): minimum entry resolution is 4.
@pytest.mark.parametrize("resolution", [64, 32, 16, 8, 4])
def test_discriminator_resolutions(resolution):
    d = pigan.Discriminator()
    params = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, resolution,
                                                  resolution))
    out = d.apply(params, x, resolution)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()


def test_discriminator_fade_in_blends():
    d = pigan.Discriminator()
    params = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    o_off = d.apply(params, x, 32, alpha=-1.0)
    o_a0 = d.apply(params, x, 32, alpha=0.0)
    o_a1 = d.apply(params, x, 32, alpha=1.0)
    # alpha=1 means fully faded in == no fade path (jnp.where picks blend at
    # alpha in [0,1), so alpha=1.0 equals off)
    np.testing.assert_allclose(np.asarray(o_a1), np.asarray(o_off), atol=1e-5)
    # alpha=0 uses only the skip branch -> differs from the full branch
    assert not np.allclose(np.asarray(o_a0), np.asarray(o_off))


def test_discriminator_param_order_of_magnitude():
    """Reference D is ~15M params (conv ladder to 400 channels)."""
    d = pigan.Discriminator()
    params = d.init(jax.random.PRNGKey(0))
    n = n_params(params)
    assert 5e6 < n < 5e7


def test_discriminator_feature_embedding():
    """apply_features: [N, 2*C] pooled penultimate activations, finite,
    distinct per input, and consistent with the logits trunk (no fade)."""
    d = pigan.Discriminator()
    params = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    f = np.asarray(d.apply_features(params, x, 32))
    assert f.shape == (4, 2 * d.cfg.channels[-1])
    assert np.isfinite(f).all()
    # different inputs embed differently
    assert not np.allclose(f[0], f[1])
    # ladder bound enforced like apply
    import pytest as _pytest
    with _pytest.raises(ValueError):
        d.apply_features(params, x, 128)


def test_frechet_from_features_separates_distributions():
    from msra_practice_project_tpu.core.metrics import frechet_from_features

    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 1.0, (256, 16))
    b = rng.normal(0.0, 1.0, (256, 16))
    c = rng.normal(2.0, 0.5, (256, 16))
    near = frechet_from_features(a, b)
    far = frechet_from_features(a, c)
    assert near < 0.3
    assert far > 10 * near
    assert frechet_from_features(a, a) == 0.0
