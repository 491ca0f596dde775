"""Test config: force an 8-device virtual CPU platform so tests run fast and
sharding tests work without TPU hardware.

The container's sitecustomize registers an ``axon`` TPU-tunnel PJRT backend at
interpreter start (~50 s first connect); overriding jax_platforms to ``cpu``
before any backend initializes keeps tests off the tunnel entirely.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
