"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (real hardware has
one chip); numeric kernels behave identically. Must run before jax imports.

TPU-gated tests: ``PW2V_TPU_TESTS=1 pytest tests/test_tpu_kernels.py``
keeps the real TPU backend and runs the COMPILED Pallas kernels against the
XLA reference paths (marker ``tpu``; auto-skipped on CPU). The regular CPU
run is unchanged.
"""

import os

_TPU_MODE = bool(int(os.environ.get("PW2V_TPU_TESTS", "0")))

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE:
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# The environment may pre-import jax (sitecustomize) with a TPU platform
# selected; the config override below still wins as long as no backend has
# been initialized yet.
import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU backend (PW2V_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    on_tpu = _TPU_MODE and jax.devices()[0].platform in ("tpu", "axon")
    skip_tpu = pytest.mark.skip(
        reason="TPU-only (set PW2V_TPU_TESTS=1 on a TPU host)")
    skip_cpu = pytest.mark.skip(
        reason="CPU suite skipped in TPU mode (one chip, no virtual mesh)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
        elif "tpu" not in item.keywords and _TPU_MODE:
            item.add_marker(skip_cpu)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order.
    return np.random.default_rng(0)
