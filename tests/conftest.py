"""Test harness: force a virtual 8-device CPU platform.

This is the TPU analogue of the reference's `mpirun -np N ./test_*`
multi-process testing (README.md:20): multi-chip sharding is validated on a
host-platform device mesh.

The execution image pre-imports jax with a TPU backend at interpreter
startup, so we must switch the platform through jax.config and clear any
initialized backends rather than rely on env vars alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        xla_bridge._clear_backends()
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) >= 8, "tests need 8 virtual devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
