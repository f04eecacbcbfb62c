"""Backend liveness guard shared by every device-touching CLI.

The TPU backend in this environment is reached through a relay process;
when the relay dies, ``jax.devices()`` blocks forever inside backend
initialization, and a CLI that hangs until an external kill records
nothing useful (the reference simply crashes on a missing CUDA runtime,
``/root/reference/code/train.py:100`` — an immediate, legible failure;
this is our equivalent). ``require_device`` probes the backend from a
daemon thread with a deadline and raises ``SystemExit`` with a clear
message instead of hanging.

Once the backend has initialized successfully, subsequent calls return
instantly (``jax.devices()`` is cached by JAX), so CLIs can call this
unconditionally at startup.
"""

from __future__ import annotations

import threading


def require_device(timeout_s: float = 180.0, who: str = "CLI") -> None:
    """Fail fast (SystemExit) if the JAX backend cannot initialize.

    timeout_s: how long to wait for backend init; first-contact TPU init
        over the relay takes a few seconds, so the default is generous.
    who: name used in the failure message (e.g. "train", "serve").
    """
    result: list = []

    def probe():
        try:
            import jax

            jax.devices()
            result.append(True)
        except Exception as e:  # surfaced below
            result.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        raise SystemExit(
            f"{who}: JAX backend did not initialize within {timeout_s:.0f}s "
            "(TPU relay down?) — refusing to hang"
        )
    if result[0] is not True:
        raise SystemExit(f"{who}: backend init failed: {result[0]}")
