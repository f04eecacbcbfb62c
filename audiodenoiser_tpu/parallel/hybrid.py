"""Hybrid multi-process x multi-device execution check (dp over DCN x tp/fsdp
over each process's local devices).

``parallel.distributed`` proves the 2-process ``jax.distributed`` bootstrap
and ``parallel.mesh`` proves dp+tp+fsdp sharding over one process's devices;
this module composes them — the production topology of a multi-*host* TPU
deployment, where the data axis crosses hosts (collectives over DCN) and the
model axis stays inside each host's slice (collectives over ICI). The
reference has no distributed story at all (SURVEY.md §2 parallelism
inventory: no DDP/NCCL/MPI anywhere); this is the TPU-native scaling design
it lacks, exercised end-to-end without real multi-host hardware: each
process provisions ``local_devices`` virtual CPU devices, the coordination
service joins them into one global device set, and one dp x tp+fsdp train
step runs over the global mesh.

Two entry points:

- :func:`child_main` — runs inside each coordinated process: builds the
  (n_processes, local_devices) global mesh with the process boundary on the
  'data' axis, shards a real ``train_step`` over it (tp+fsdp param layout
  from ``parallel.mesh``, batch from per-process host shards via
  ``jax.make_array_from_process_local_data``), and asserts the sharded loss
  equals a single-device monolithic step on the same global batch.
- :func:`launch_hybrid_check` — spawns the coordinated processes from a
  normal single-process caller (the test suite / ``__graft_entry__``
  dryrun), collects their reports, and retries once with a fresh port
  (the gloo rendezvous can miss its window under CPU contention).
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys


def child_main(local_devices: int = 4) -> None:
    """Body of one coordinated process. Requires the JAX_COORDINATOR_*
    env vars (set by :func:`launch_hybrid_check`)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from audiodenoiser_tpu.parallel.distributed import maybe_initialize

    assert maybe_initialize(), "expected distributed init config in env"
    n_proc = jax.process_count()
    assert jax.local_device_count() == local_devices, jax.local_device_count()
    assert jax.device_count() == n_proc * local_devices, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from audiodenoiser_tpu.models import UNet
    from audiodenoiser_tpu.parallel import param_shardings, shard_train_state
    from audiodenoiser_tpu.train.loop import create_train_state, train_step

    # dp over DCN (process axis) x tp+fsdp over each process's local devices
    # ("ICI"): jax.devices() orders all of process 0's devices first, so the
    # reshape puts exactly one process on each 'data' row.
    devices = np.asarray(jax.devices()).reshape(n_proc, local_devices)
    for proc, row in enumerate(devices):
        assert all(d.process_index == proc for d in row), (
            "process boundary not on the data axis"
        )
    mesh = Mesh(devices, ("data", "model"))

    # wide enough for the tp/fsdp rules to engage (cout >= 128)
    model = UNet(features=(32, 128), bottleneck=256, dtype=jnp.float32)
    state = create_train_state(
        jax.random.key(0), model, input_shape=(1, 32, 32, 1)
    )
    sharded = shard_train_state(state, mesh, fsdp=True)
    specs = param_shardings(sharded.params, mesh, fsdp=True)
    n_sharded = sum(
        int(any(a is not None for a in s.spec))
        for s in jax.tree_util.tree_leaves(specs)
    )
    assert n_sharded > 0, "tp+fsdp rules sharded nothing"

    batch = 2 * n_proc
    per_proc = batch // n_proc

    def host_batch(seed: int) -> np.ndarray:
        r = np.random.default_rng(seed)
        return np.abs(r.standard_normal((batch, 32, 32, 1))).astype(np.float32)

    def global_batch(host: np.ndarray):
        i = jax.process_index()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", None, None, None)),
            host[i * per_proc:(i + 1) * per_proc],
            global_shape=host.shape,
        )

    noisy_h, clean_h = host_batch(1), host_batch(2)
    new_state, losses = train_step(
        sharded, global_batch(noisy_h), global_batch(clean_h)
    )
    jax.block_until_ready(new_state.params)
    total = float(losses.total)
    assert np.isfinite(total), total

    # parity: the dp-over-DCN x tp-over-local step must equal a monolithic
    # single-device step on the same global batch and initial state.
    # train_step donates its state buffers and shard_train_state passes
    # non-array leaves (the step counter) through by identity, so the
    # reference needs an independently-created state (same key -> same
    # params), not the already-donated original.
    ref_state = create_train_state(
        jax.random.key(0), model, input_shape=(1, 32, 32, 1)
    )
    _, ref_losses = train_step(
        ref_state, jnp.asarray(noisy_h), jnp.asarray(clean_h)
    )
    ref = float(ref_losses.total)
    assert abs(total - ref) < 1e-5 * max(1.0, abs(ref)), (total, ref)

    # and every process must hold the identical loss scalar (the dp grad
    # psum crossed DCN)
    all_tot = multihost_utils.process_allgather(np.array([total]))
    np.testing.assert_allclose(all_tot.ravel(), total, rtol=1e-6)
    print(
        f"HYBRID_OK proc={jax.process_index()}/{n_proc} "
        f"mesh={dict(mesh.shape)} sharded_leaves={n_sharded} "
        f"loss={total:.6f} ref={ref:.6f}",
        flush=True,
    )


def _sanitized_env(port: int, n_processes: int, process_id: int,
                   local_devices: int) -> dict:
    """Child env: coordinator config set, any inherited device-count
    overrides (the test suite's --xla_force_host_platform_device_count=8)
    stripped so the child really provisions ``local_devices``."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\S+", "", flags)
    env["XLA_FLAGS"] = flags.strip()
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(n_processes),
        JAX_PROCESS_ID=str(process_id),
        AUDIODENOISER_HYBRID_LOCAL_DEVICES=str(local_devices),
    )
    return env


def launch_hybrid_check(n_processes: int = 2, local_devices: int = 4,
                        timeout: float = 420.0) -> str:
    """Spawn the coordinated hybrid processes; return the rank-0 report.

    Raises AssertionError (with both processes' output) if any child fails
    after one retry.
    """

    def run_once():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "audiodenoiser_tpu.parallel.hybrid"],
                env=_sanitized_env(port, n_processes, pid, local_devices),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                ),
            )
            for pid in range(n_processes)
        ]
        try:
            outs = [p.communicate(timeout=timeout)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            return ["TIMEOUT"] * n_processes, procs
        return outs, procs

    # one retry with a fresh port (same policy as the 2-process bootstrap
    # test): the gloo rendezvous can miss its window under CPU contention
    for attempt in (0, 1):
        outs, procs = run_once()
        if all(
            p.returncode == 0 and "HYBRID_OK" in out
            for p, out in zip(procs, outs)
        ):
            for line in outs[0].splitlines():
                if "HYBRID_OK" in line:
                    return line.strip()
        if attempt == 1:
            raise AssertionError(f"hybrid dp(DCN) x tp(local) check failed "
                                 f"twice: {outs}")
    raise AssertionError("unreachable")


if __name__ == "__main__":
    child_main(int(os.environ.get("AUDIODENOISER_HYBRID_LOCAL_DEVICES", "4")))
