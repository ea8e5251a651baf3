"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so sharding tests use
XLA's host-platform device forcing. Env vars must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the axon TPU tunnel for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize may have imported jax already (capturing JAX_PLATFORMS=axon),
# so override through the live config as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_complex(rng, shape, dtype=np.complex64):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(dtype)


@pytest.fixture
def make_complex(rng):
    def _make(shape, dtype=np.complex64):
        return random_complex(rng, shape, dtype)
    return _make
