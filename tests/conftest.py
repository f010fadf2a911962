"""Test harness: force JAX onto CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md sect.4 implication (d)).

Note: this environment's sitecustomize imports jax at interpreter startup and
pins jax_platforms to "axon,cpu" (the TPU tunnel), so env vars alone cannot
steer tests to CPU — we must update jax.config after import, before any
backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(7)
