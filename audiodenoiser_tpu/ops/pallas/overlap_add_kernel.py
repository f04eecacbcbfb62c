"""Pallas TPU kernel: iSTFT overlap-add accumulation.

Back-end counterpart of the fused STFT kernel: accumulates windowed iDFT
frames (B, T, n_fft) into the output signal (B, (T-1)*hop + n_fft) entirely
in VMEM — one program per 8-row batch tile, sequential VPU adds over the T
frames, single HBM write of the finished rows. Exposed as an alternative to
the scatter-free XLA path in ``dsp.stft.overlap_add`` and cross-checked
against it in ``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_BLK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ola_kernel(frames_ref, out_ref, acc_ref, *, hop: int, n_fft: int,
                t_frames: int):
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, _):
        start = pl.multiple_of(t * hop, hop)
        acc_ref[:, pl.ds(start, n_fft)] = (
            acc_ref[:, pl.ds(start, n_fft)] + frames_ref[:, t, :]
        )
        return 0

    jax.lax.fori_loop(0, t_frames, body, 0)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("hop_length", "interpret"))
def overlap_add_pallas(
    frames: jax.Array,  # (B, T, n_fft), already windowed
    hop_length: int,
    interpret: bool = False,
) -> jax.Array:
    if frames.ndim != 3:
        raise ValueError(f"expected (batch, frames, n_fft), got {frames.shape}")
    b, t_frames, n_fft = frames.shape
    b_pad = _round_up(max(b, 1), BATCH_BLK)
    if b_pad != b:
        frames = jnp.pad(frames, ((0, b_pad - b), (0, 0), (0, 0)))
    out_len = (t_frames - 1) * hop_length + n_fft
    kernel = functools.partial(
        _ola_kernel, hop=hop_length, n_fft=n_fft, t_frames=t_frames
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // BATCH_BLK,),
        in_specs=[
            pl.BlockSpec(
                (BATCH_BLK, t_frames, n_fft), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_BLK, out_len), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_len), frames.dtype),
        scratch_shapes=[pltpu.VMEM((BATCH_BLK, out_len), frames.dtype)],
        interpret=interpret,
    )(frames)
    return out[:b]
