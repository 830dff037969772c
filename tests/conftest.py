"""Test harness: run everything on CPU with 8 virtual devices so mesh /
sharding tests work without TPU hardware (and TPU compiles don't slow the
suite). Must set env before the first jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
