"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's absence of a test suite by *replacing* it with the
standard JAX fake-backend strategy (SURVEY.md §4): tests never require TPU
hardware, and multi-chip sharding paths are exercised on
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# silence the per-load cpu_aot_loader LOG(ERROR) about XLA's synthetic
# +prefer-no-scatter/+prefer-no-gather pseudo-features when reloading
# persistent-cache entries (the real ISA feature sets match)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
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

# Persistent compilation cache: this box has ONE cpu core, so XLA compiles
# dominate suite wall time (~20 min cold). With the cache, re-runs skip
# every unchanged compile (measured 12.3 s -> 1.0 s for a UNet init); keys
# hash the HLO, so edits recompile exactly what changed.
#
# The cache dir is keyed by the HOST CPU's feature set: XLA:CPU serializes
# machine-code executables whose cache key does NOT include the compile
# host's ISA features, so a cache written on one machine and read on
# another with different features loads foreign machine code — observed as
# a hard SIGSEGV inside get_executable_and_time when this repo moved hosts
# between rounds (the cpu_aot_loader machine-feature warnings are the
# same mismatch, non-fatally). One dir per feature set makes a host
# change a cold cache instead of a crash.
from audiodenoiser_tpu.utils.cache import host_cpu_cache_key  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", host_cpu_cache_key()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# keep CLI mains invoked by tests from redirecting the cache away from
# .jax_cache mid-suite (utils/cache.enable_persistent_cache honors this)
os.environ.setdefault("ADT_NO_COMPILE_CACHE", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
