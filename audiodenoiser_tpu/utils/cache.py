"""Persistent XLA compilation cache for the CLI entry points.

The test suite already uses a persistent cache (tests/conftest.py) — cold
suite ~20 min vs warm ~8.5 min on a 1-core host. Production CLI runs pay
the same compile costs on every invocation (a full ensemble retrain spends
several minutes purely in XLA compiles), so every CLI enables the cache at
startup. Keys hash the HLO, so code changes recompile exactly what
changed; backends that cannot serialize executables simply skip it.

Opt out with ``ADT_NO_COMPILE_CACHE=1``; relocate with
``ADT_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "audiodenoiser_tpu", "xla"
)


def host_cpu_cache_key() -> str:
    """Stable identifier of this host's CPU feature set.

    XLA:CPU persistent-cache keys hash the HLO but NOT the compile host's
    ISA features, and the serialized executable is machine code — loading
    an entry written on a host with different features is undefined
    behavior (observed: SIGSEGV in the AOT loader when this repo's cache
    survived a host change between build rounds). Keying the cache
    directory by the feature set turns that into a cold cache instead.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    h = hashlib.sha1(
        (platform.machine() + ":" + flags).encode()
    ).hexdigest()[:10]
    return f"cpu-{h}"


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Safe to call multiple times; must run before the first compilation to
    benefit that process. Returns the cache dir, or None when disabled.
    """
    if os.environ.get("ADT_NO_COMPILE_CACHE"):
        return None
    import jax

    path = (
        cache_dir
        or os.environ.get("ADT_COMPILE_CACHE_DIR")
        or _DEFAULT_DIR
    )
    plat = os.environ.get("JAX_PLATFORMS", "").lower()
    if not plat or "cpu" in plat:
        # XLA:CPU executables are host machine code and the cache key
        # ignores ISA features — isolate per host feature set (see
        # host_cpu_cache_key). TPU/axon executables target the chip, not
        # the host, so those keep the shared (warm) directory.
        path = os.path.join(path, host_cpu_cache_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
