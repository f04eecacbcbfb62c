"""Pallas TPU kernel: fused framing + window + real-DFT STFT.

The reference's STFT hot loop is one librosa call per chunk on the CPU
(``/root/reference/code/create_train_dataset.py:242-243``). The XLA path in
``dsp/stft.py`` already batches it on device; this kernel goes one step
further and fuses the whole front end into a single VMEM-resident pass per
batch tile:

  HBM: x tile (8 rows x L samples) --DMA--> VMEM
    -> for each 16-frame chunk: frame into scratch (strided copies),
       multiply by the analysis window (VPU), dot with the real DFT bases
       (n_fft x F cos/sin) on the MXU
  <- write (8, T, F) real + imag planes

i.e. the framed+windowed intermediate — 4x the signal size at the 512/128
default — never touches HBM, and the transform itself rides the systolic
array (the nnAudio conv-STFT idea, natively tiled for the MXU). The DFT
bases are trace-time constants shared across the grid; the frequency axis
is padded to the 128-lane boundary; the batch is tiled in groups of 8
(the float32 sublane minimum).

VMEM budget at defaults (L=16000): 8x64 KB rows + an 8x16x512 chunk
scratch (256 KB) + two 512x384 bases (1.5 MB) + two (8,T,384) outputs —
the chunked frame loop keeps the footprint bounded for any T (a
whole-frame scratch overflowed the ~16 MB/core limit at batch 256).

Exposed through ``dsp.stft.stft(..., precision='pallas')``; exactness vs
the jnp.fft path is asserted in ``tests/test_pallas.py`` (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_BLK = 8  # float32 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


T_CHUNK = 16  # frames transformed per MXU call: bounds VMEM scratch


def _stft_kernel(x_ref, cos_ref, sin_ref, win_ref, re_ref, im_ref, frames_ref,
                 *, n_fft: int, hop: int, t_frames: int):
    # t_frames is padded to a multiple of T_CHUNK by the wrapper
    f_pad = cos_ref.shape[1]

    def chunk_body(c, _):
        base = pl.multiple_of(c * T_CHUNK, T_CHUNK)

        def fill(t, _):
            start = pl.multiple_of((base + t) * hop, hop)
            for r in range(BATCH_BLK):
                frames_ref[r, t, :] = x_ref[r, pl.ds(start, n_fft)] * win_ref[0, :]
            return 0

        jax.lax.fori_loop(0, T_CHUNK, fill, 0)
        fw = frames_ref[:].reshape(BATCH_BLK * T_CHUNK, n_fft)
        # HIGHEST keeps full fp32 mantissas through the MXU (3-pass bf16),
        # holding the fused path within float tolerance of the rfft path
        re = jnp.dot(fw, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(fw, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        re_ref[:, pl.ds(base, T_CHUNK), :] = re.reshape(BATCH_BLK, T_CHUNK, f_pad)
        im_ref[:, pl.ds(base, T_CHUNK), :] = im.reshape(BATCH_BLK, T_CHUNK, f_pad)
        return 0

    jax.lax.fori_loop(0, t_frames // T_CHUNK, chunk_body, 0)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "interpret")
)
def stft_pallas(
    x: jax.Array,  # (B, L) pre-padded signal (center handling done upstream)
    window: jax.Array,  # (n_fft,)
    n_fft: int = 512,
    hop_length: int = 128,
    interpret: bool = False,
):
    """Fused STFT of a batch of rows. Returns (re, im), each (B, F, T)."""
    if x.ndim != 2:
        raise ValueError(f"expected (batch, samples), got {x.shape}")
    b, length = x.shape
    b_pad = _round_up(max(b, 1), BATCH_BLK)
    t_frames = 1 + (length - n_fft) // hop_length
    t_pad = _round_up(t_frames, T_CHUNK)
    # pad rows so the trailing padded frames still slice valid memory
    length_pad = (t_pad - 1) * hop_length + n_fft
    if b_pad != b or length_pad != length:
        x = jnp.pad(x, ((0, b_pad - b), (0, length_pad - length)))
    length = length_pad
    n_freq = n_fft // 2 + 1

    n = np.arange(n_fft)
    k = np.arange(n_freq)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    f_pad = _round_up(n_freq, 128)
    cos_b = np.zeros((n_fft, f_pad), np.float32)
    sin_b = np.zeros((n_fft, f_pad), np.float32)
    cos_b[:, :n_freq] = np.cos(ang)
    sin_b[:, :n_freq] = np.sin(ang)

    kernel = functools.partial(
        _stft_kernel, n_fft=n_fft, hop=hop_length, t_frames=t_pad
    )
    re, im = pl.pallas_call(
        kernel,
        grid=(b_pad // BATCH_BLK,),
        in_specs=[
            pl.BlockSpec((BATCH_BLK, length), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BATCH_BLK, t_pad, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLK, t_pad, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, t_pad, f_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BATCH_BLK, T_CHUNK, n_fft), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_pad * t_frames * n_fft * f_pad,
            bytes_accessed=4 * b_pad * (length + 2 * t_frames * f_pad),
            transcendentals=0,
        ),
    )(x, jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(window, jnp.float32).reshape(1, n_fft))
    # (Bpad, Tpad, Fpad) -> (B, F, T) librosa layout
    return (
        jnp.swapaxes(re[:b, :t_frames, :n_freq], -1, -2),
        jnp.swapaxes(im[:b, :t_frames, :n_freq], -1, -2),
    )
