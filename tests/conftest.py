"""Test harness: force an 8-device virtual CPU mesh (multi-chip sharding tests
run without real TPU hardware) and enable float64 for densified oracles.

Must configure jax before any backend is initialized, hence module level.
"""

import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Hermetic autotune cache: runner tests default --autotune-cache on; a
# per-session empty file keeps them from reading (or polluting) the user's
# ~/.cache picks across test runs.
os.environ["DCTN_TPU_AUTOTUNE_CACHE"] = os.path.join(
    tempfile.mkdtemp(prefix="dctn_tpu_test_"), "autotune.json"
)

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. re-entrant run); tests that need
    # 8 devices will skip themselves
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
