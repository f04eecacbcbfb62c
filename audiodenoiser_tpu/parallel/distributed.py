"""Multi-host bootstrap (SURVEY.md §5 distributed-communication plan).

The reference has no distributed story at all. Here, multi-*chip* scaling
is handled by the mesh/sharding rules in ``parallel.mesh`` (XLA collectives
over ICI); this module adds the multi-*host* entry point: call
``maybe_initialize()`` once at process start and JAX's coordination service
wires every host's chips into one global device set, after which the same
mesh code spans slices (collectives over ICI within a slice, DCN across).

Configuration comes from the standard JAX env vars
(``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or
explicit arguments. On a single host (no coordinator configured) this is an
exact no-op, so every entry point can call it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host config is present.

    Returns True if the distributed runtime was (already) initialized,
    False for the single-host no-op path.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    import jax

    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID"
    )
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
