"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
tunneled real TPU); env vars are therefore snapshotted before conftest runs
and we must switch platforms through jax.config instead. XLA_FLAGS is read
lazily at first backend init, so setting it here still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the slow tier is dominated by XLA compiles on
# the single host core (the SPMD train-step programs take minutes each);
# repeat runs of an unchanged program load from disk instead.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_accumulated_state():
    """Release compiled executables and live buffers between test modules.

    A full-suite run accumulates every module's jitted programs in jax's
    in-memory caches; clearing per module bounds native-heap growth (a
    full `pytest tests/` run aborted inside XLA after ~70 tests without
    this, while any subset passed)."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
