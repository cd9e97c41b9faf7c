"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip test strategy from SURVEY.md §4: CPU devices are the
TPU-world "fake backend" for exercising sharding and collectives without
hardware. Must set the env vars before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: parity tests that import /root/reference as oracle"
    )
