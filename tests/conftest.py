"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container env pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel); for
tests we switch to the CPU backend with 8 virtual devices so kernel
correctness and sharding can be validated quickly and without TPU access
(same substitution SURVEY.md §4 calls out).  The axon sitecustomize
overrides the env var, so force the config after import instead.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
