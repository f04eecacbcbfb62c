"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's absence of a test suite by *replacing* it with the
standard JAX fake-backend strategy (SURVEY.md §4): tests never require TPU
hardware, and multi-chip sharding paths are exercised on
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by site hooks that captured JAX_PLATFORMS from
# the outer environment; force the CPU backend before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
