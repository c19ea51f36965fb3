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
# XLA:CPU's async thunk executor sizes its pool by host core count; on a
# 1-core host all 8 virtual devices share ONE executor thread, so the
# first device to block in a collective rendezvous starves the other
# seven -> 20 s "stuck" warnings -> SIGABRT mid-suite. Synchronous
# dispatch executes each device program on its own caller thread, which
# cannot starve (observed: test_tp_flash train step aborted async,
# passes sync; throughput on multi-core hosts is unaffected for tests).
jax.config.update("jax_cpu_enable_async_dispatch", False)
# Persistent compile cache: the slow tier is dominated by XLA compiles on
# the single host core (the SPMD train-step programs take minutes each);
# repeat runs of an unchanged program load from disk instead.
#
# Host-fingerprinted cache dir: stale cross-host XLA:CPU AOT entries
# execute wrong-machine code and abort (see unidepth_tpu/utils/cache.py).
from unidepth_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(jax, min_compile_secs=10.0)

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
