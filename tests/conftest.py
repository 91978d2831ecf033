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
