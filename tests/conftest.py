"""Test configuration.

Tests run on 8 virtual CPU devices (multi-chip simulation, SURVEY.md §4.6)
unless LIBHPC_TEST_TPU=1, in which case the real TPU backend is used.
The config updates MUST run before any jax backend initialization — the
axon/TPU plugin force-registers itself, so env flags alone don't stick.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("LIBHPC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    from libhpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# the reference's deliberate edge-size sweep
# (test_radix_local_count.cu:199-201): sub-tile, non-multiples, multi-tile
EDGE_SIZES = [1, 111, 256, 297, 500, 512, 3987, 1024 * 256 + 57]


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
