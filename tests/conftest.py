"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (real hardware has
one chip); numeric kernels behave identically. Must run before jax imports.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment may pre-import jax (sitecustomize) with a TPU platform
# selected; the config override below still wins as long as no backend has
# been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order.
    return np.random.default_rng(0)
