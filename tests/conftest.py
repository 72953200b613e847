"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the driver does it -- via
``--xla_force_host_platform_device_count`` -- since only one real TPU chip is
reachable from this environment.

Note: this environment's sitecustomize imports jax and registers the axon TPU
plugin at interpreter startup, so env vars set here are too late;
``jax.config.update`` still works because no backend has been *resolved* yet.
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

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
