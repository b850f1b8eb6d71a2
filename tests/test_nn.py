"""Unit tests for core.nn: shapes, init distributions, golden PE values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msra_practice_project_tpu.core import nn


def test_dense_apply_shapes_and_activation():
    key = jax.random.PRNGKey(0)
    p = nn.dense_init(key, 4, 8, "relu")
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    y = nn.dense_apply(p, x, "relu")
    assert y.shape == (16, 8)
    assert (y >= 0).all()  # relu output


def test_dense_init_xavier_bounds():
    key = jax.random.PRNGKey(0)
    for act, gain in [("linear", 1.0), ("relu", np.sqrt(2.0)),
                      ("tanh", 5.0 / 3.0)]:
        p = nn.dense_init(key, 256, 256, act)
        bound = gain * np.sqrt(6.0 / 512)
        w = np.asarray(p["w"])
        assert np.abs(w).max() <= bound + 1e-6
        # Uniform on [-b, b] has std b/sqrt(3); check within 5%.
        assert np.isclose(w.std(), bound / np.sqrt(3), rtol=0.05)
        assert (np.asarray(p["b"]) == 0).all()


@pytest.mark.parametrize("scheme,w_bound,zero_bias", [
    ("first", 1.0 / 256, False),
    ("hidden", np.sqrt(6.0 / 256) / 30, False),
    ("nerf", np.sqrt(6.0 / 256) / 30, True),
    ("nerf_first", 1.0 / 30, True),
    ("torch_default", 1.0 / 16.0, False),
])
def test_siren_init_schemes(scheme, w_bound, zero_bias):
    p = nn.siren_init(jax.random.PRNGKey(0), 256, 256, scheme=scheme)
    w = np.asarray(p["w"])
    assert np.abs(w).max() <= w_bound + 1e-9
    assert w.std() > 0.4 * w_bound  # actually spread out, not collapsed
    if zero_bias:
        assert (np.asarray(p["b"]) == 0).all()
    else:
        b = np.asarray(p["b"])
        assert np.abs(b).max() <= 1.0 / np.sqrt(256) + 1e-9
        assert b.std() > 0


def test_siren_apply_matches_formula():
    p = nn.siren_init(jax.random.PRNGKey(0), 3, 7, scheme="nerf")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    got = nn.siren_apply(p, x)
    want = jnp.sin(30.0 * (x @ p["w"] + p["b"]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_film_siren_init_and_apply():
    p = nn.film_siren_init(jax.random.PRNGKey(0), 256, 256)
    w = np.asarray(p["w"])
    assert np.abs(w).max() <= np.sqrt(6.0 / 256) / 30 + 1e-9
    p1 = nn.film_siren_init(jax.random.PRNGKey(0), 3, 256,
                            is_first_layer=True)
    assert np.abs(np.asarray(p1["w"])).max() <= 1.0 / 3 + 1e-9

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    gamma = jnp.ones((256,)) * 2.0
    beta = jnp.ones((256,)) * 0.5
    got = nn.film_siren_apply(p, x, gamma, beta)
    # wiring check: gamma/beta placement (sine impl checked separately below)
    want = nn.trunk_sin(30.0 * (2.0 * (x @ p["w"] + p["b"]) + 0.5))
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(
        got, jnp.sin(30.0 * (2.0 * (x @ p["w"] + p["b"]) + 0.5)), atol=5e-6)


def test_fast_sin_accuracy_and_grad():
    """fast_sin (the SIREN/FiLM trunk sine, ~4.6x HW sin on v5e) must match
    jnp.sin to <3e-6 over the SIREN argument range, and its hand-written
    derivative must match autodiff."""
    v = jnp.linspace(-40.0, 40.0, 100001)
    np.testing.assert_allclose(np.asarray(nn.fast_sin(v)),
                               np.asarray(jnp.sin(v)), atol=3e-6)
    g_auto = jax.vmap(jax.grad(nn.fast_sin))(v)
    np.testing.assert_allclose(np.asarray(nn.trunk_sin_vjp(v)),
                               np.asarray(g_auto), atol=1e-6)
    # derivative is also close to the true cos
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(jnp.cos(v)),
                               atol=1e-4)


def test_positional_encoding_golden():
    """PE ordering matches the reference: [sin(2^0 x), cos(2^0 x),
    sin(2 x), cos(2 x), ...] concatenated over the full input vector."""
    x = jnp.array([[0.5, -1.0]])
    out = nn.positional_encoding(x, 3)
    assert out.shape == (1, 12)
    want = []
    for i in range(3):
        want += [np.sin(2.0**i * np.array([0.5, -1.0]))]
        want += [np.cos(2.0**i * np.array([0.5, -1.0]))]
    want = np.concatenate(want)
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-6)


def test_positional_encoding_dim():
    assert nn.positional_encoding_dim(3, 10) == 60
    assert nn.positional_encoding_dim(3, 4) == 24
    x = jnp.zeros((7, 5, 3))
    assert nn.positional_encoding(x, 10).shape == (7, 5, 60)
