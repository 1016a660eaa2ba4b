"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

Multi-device tests run against a fake 8-device CPU mesh
(--xla_force_host_platform_device_count), the JAX-native way to exercise
sharding without a real TPU slice (SURVEY §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# A sitecustomize on this image re-exports JAX_PLATFORMS=axon (TPU) at
# interpreter startup; the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def table_sub2():
    from surface_vision_transformers_tpu import geometry as G

    return G.load_patch_table(6, 2)
