"""Test harness: run everything on CPU with 8 virtual devices so mesh /
sharding tests work without TPU hardware (and TPU compiles don't slow the
suite). Must set env before the first jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env may ship a TPU plugin that overrides JAX_PLATFORMS (e.g. axon);
# force CPU through the config API as well.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: tiny-model jit compiles dominate suite runtime
from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".xla_cache"))

# trace cache (utils/progcache.py) OFF for the suite: exporting every tiny
# jit doubles compile work and its flattened programs miss the persistent
# .xla_cache, blowing the ~8 min suite past 30 (measured). test_progcache
# re-enables per-test via monkeypatch; the TPU CLIs run with it on.
os.environ.setdefault("DSCALER_NO_TRACE_CACHE", "1")
os.environ.setdefault(
    "DSCALER_TRACE_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".trace_cache")
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
