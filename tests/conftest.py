"""Test environment: CPU backend with 8 virtual devices.

Tests must run without TPU hardware (SURVEY.md §4): the jax CPU backend is
forced before jax initializes, and 8 virtual devices are requested so
sharding/pjit tests exercise real multi-device programs (XLA inserts the same
collectives it would over ICI).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test-time compiles out of the user's persistent cache. Under
# pytest-xdist each worker gets its own directory so concurrent engine
# registry / orbax writes cannot race (scripts/ci.sh --fast runs -n auto).
_worker = os.environ.get("PYTEST_XDIST_WORKER", "")
os.environ.setdefault(
    "MDET_CACHE_DIR",
    "/tmp/mdet_test_cache" + (f"_{_worker}" if _worker else ""),
)

# The axon TPU plugin (remote tunnel) ignores JAX_PLATFORMS; force the CPU
# platform through jax.config, which it does respect.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# Tests exercise structure/shape/perf paths with deterministic random params;
# production strictness (error on missing checkpoint) has its own test via
# the allow_random_weights(False) context manager.
from monocular_depth_estimation_trt_tpu.weights.store import (
    set_allow_random_weights,
)

set_allow_random_weights(True)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
