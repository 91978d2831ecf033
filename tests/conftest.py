"""Test configuration: force CPU jax with 8 virtual devices, so tests are
fast/deterministic and sharding tests exercise real multi-device paths
without TPU hardware (SURVEY.md section 4: distributed tests without a
cluster).

The hosting environment's sitecustomize imports jax and registers a TPU
plugin before conftest runs, so plain env-var edits are too late for
jax_platforms -- use jax.config.update (valid until backends initialize).
XLA_FLAGS is still read lazily at backend init.

Set ISAKLM_TEST_PLATFORM=tpu to deliberately run the suite on the real
device.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("ISAKLM_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of distinct XLA CPU programs in one
    process; with all of them held live, LLVM JIT compilation started
    segfaulting near the end of the run (reproduced 3x at ~80%, always
    inside backend_compile_and_load; any single module passes alone).
    Clearing the pjit executable cache per module bounds live code size.
    The per-module lru_cache'd step factories recompile on next use, which
    costs a few seconds per module and nothing in correctness."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()
