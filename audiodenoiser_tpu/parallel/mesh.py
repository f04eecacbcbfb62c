"""Device-mesh construction and sharding rules (dp + channel-tp).

The reference is strictly single-device — no DDP/NCCL/MPI anywhere
(SURVEY.md §2 parallelism inventory). This module provides the TPU-native
scaling story promised there: a 2-D ``Mesh(('data', 'model'))`` where

- the **data** axis shards the batch dimension of every activation
  (gradient all-reduce inserted by XLA SPMD, riding ICI);
- the **model** axis shards the *output-channel* dimension of the wide
  convolution kernels (tensor parallelism for a CNN: each device computes a
  channel slice of the feature maps; XLA inserts the input-channel
  all-reduces where layouts meet).

On a single chip everything degenerates to a 1x1 mesh with zero overhead;
all code is written mesh-generic, so the same train step compiles for
v5e-1 and for an N-chip slice unchanged. Multi-chip correctness is
exercised on a virtual 8-device CPU mesh in ``tests/test_parallel.py`` and
by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``model_parallel`` defaults to 2 when the device count is even and > 1
    (cheap channel-TP), else 1.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if (n > 1 and n % 2 == 0) else 1
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def _param_spec(path: tuple, leaf, model_size: int, fsdp_size: int = 1) -> P:
    """Sharding rule for one parameter leaf.

    Conv/ConvTranspose kernels are (kh, kw, cin, cout): shard cout over
    'model' when it divides evenly and is wide enough to be worth a
    collective (tensor parallelism). With ``fsdp_size > 1`` (FSDP/ZeRO-3
    layout) the input-channel dim additionally shards over 'data', so
    parameters AND optimizer moments scale down with the data-parallel
    degree — XLA SPMD inserts the all-gather before each use and
    reduce-scatters the gradients. Per-channel vectors (biases, BN
    scale/bias) follow their layer's cout sharding so the channel slices
    line up without resharding.
    """
    shape = np.shape(leaf)
    if len(shape) == 4:
        spec = [None, None, None, None]
        if model_size > 1 and shape[3] % model_size == 0 and shape[3] >= 128:
            spec[3] = MODEL_AXIS
        if fsdp_size > 1 and shape[2] % fsdp_size == 0 and shape[2] >= 128:
            spec[2] = DATA_AXIS
        if all(a is None for a in spec):
            return P()  # fully replicated: canonical empty spec
        return P(*spec)
    if (
        len(shape) == 1
        and model_size > 1
        and shape[0] % model_size == 0
        and shape[0] >= 128
    ):
        return P(MODEL_AXIS)
    return P()


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Pytree of NamedShardings implementing the dp+tp (+fsdp) layout."""
    model_size = mesh.shape[MODEL_AXIS]
    fsdp_size = mesh.shape[DATA_AXIS] if fsdp else 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _param_spec(path, leaf, model_size, fsdp_size))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_train_state(state: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Place a TrainState on the mesh: params/opt/bn sharded per rules.

    Optimizer moments mirror their parameter's sharding (same shapes);
    scalar counters replicate. ``fsdp=True`` additionally shards wide
    kernels (and their AdamW moments) over the data axis — per-chip
    optimizer-state memory drops by ~the data-parallel degree.
    """
    fsdp_size = mesh.shape[DATA_AXIS] if fsdp else 1

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = _param_spec((), x, mesh.shape[MODEL_AXIS], fsdp_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, state)


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """Place a Flax variable collection ({'params', 'batch_stats', ...}) on
    the mesh for inference: wide conv kernels channel-TP sharded over
    'model', everything else replicated — the same rules training uses, so
    eval/serving scale over the identical layout."""
    return shard_train_state(variables, mesh)
