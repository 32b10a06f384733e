"""Test env: force the CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4 "multi-node without a cluster").

Note: this image's sitecustomize registers the axon TPU plugin and overrides
the JAX_PLATFORMS *env var*, so the override must go through jax.config
before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def assets_dir():
    path = os.environ.get("RT_ASSETS", "/root/reference/assets")
    if not os.path.isdir(path):
        pytest.skip("reference assets not available")
    return path


@pytest.fixture
def rand():
    return np.random.default_rng(1234)
