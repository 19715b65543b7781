"""Test harness: force JAX onto CPU with 8 virtual devices so sharding tests
run without a TPU pod (SURVEY.md section 4).

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so the platform must be overridden via jax.config (env
vars are already latched); XLA_FLAGS is still read at first backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
