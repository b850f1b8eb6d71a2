"""Test config: force CPU backend with 8 virtual devices BEFORE jax inits.

This is the standard JAX "fake backend" for exercising Mesh/pjit/shard_map
code paths without TPU hardware (SURVEY.md §4).  Bench/production entry
points do NOT import this and run on the real chip.

NOTE: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and a
sitecustomize hook re-asserts it, so we must both overwrite the env var AND
update jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.devices()}"
    )
