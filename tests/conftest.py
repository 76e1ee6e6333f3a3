"""Test harness config.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (and without paying tunnel-compile latency
per jit shape).  The environment pre-imports jax with the 'axon' TPU
platform selected via sitecustomize, so we flip the (not yet initialized)
backend here.  Set FASTX_TPU_TEST_REAL=1 to run the suite on the real
device instead.
"""

import os

import pytest  # noqa: F401


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long randomized sweeps (always run; marker is informational)"
    )

if not os.environ.get("FASTX_TPU_TEST_REAL"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

REFERENCE = "/root/reference"
TEST_DATA = os.path.join(REFERENCE, "galaxy", "test-data")


def has_reference() -> bool:
    return os.path.isdir(TEST_DATA)
