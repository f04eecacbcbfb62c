"""Pallas TPU kernel: fused inverse-DFT + window + overlap-add iSTFT.

Mirror of the forward kernel in ``stft_kernel.py``: for each 8-row batch
tile the inverse real DFT runs as two MXU matmuls against constant bases

    frames = Re(S) @ C + Im(S) @ D,
    C[k, n] = w_k cos(2*pi*k*n/N) / N,  D[k, n] = -w_k sin(2*pi*k*n/N) / N,
    w_0 = w_{N/2} = 1, otherwise 2   (the Hermitian-symmetry fold of irfft)

then the synthesis window is applied and frames are overlap-added, all in
VMEM — the (T, n_fft) frame tensor (4x the signal size at the 512/128
default) never exists in HBM.

Like the forward kernel, the time axis is processed in ``T_CHUNK``-frame
chunks — here as the inner (sequential) grid dimension, with the
``n_fft - hop`` overlap-add spill carried between chunks in a small VMEM
scratch. VMEM per step is therefore constant (~3.5 MB at defaults)
regardless of clip length: a 60 s serve-limit clip compiles in the same
footprint as a 2 s training chunk (an unchunked version staged the whole
(8, T, n_fft) frame tensor and overflowed the ~16 MB/core budget beyond
~8 s clips).

The squared-window normalization envelope and center trimming stay in
``dsp.stft.istft`` (trace-time constants / cheap slices), which exposes
this kernel via ``precision='pallas'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_BLK = 8
T_CHUNK = 16  # frames inverse-transformed per grid step: bounds VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _istft_kernel(re_ref, im_ref, cos_ref, sin_ref, win_ref, out_ref,
                  frames_ref, seg_ref, tail_ref, *, n_fft: int, hop: int):
    c = pl.program_id(1)
    f_pad = cos_ref.shape[0]
    tail_len = n_fft - hop
    re = re_ref[:].reshape(BATCH_BLK * T_CHUNK, f_pad)
    im = im_ref[:].reshape(BATCH_BLK * T_CHUNK, f_pad)
    frames = jnp.dot(re, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    frames = frames + jnp.dot(im, sin_ref[:], preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    # stage windowed frames in VMEM scratch — Mosaic only supports dynamic
    # slicing through refs, not computed values
    frames_ref[:] = (frames * win_ref[0, :]).reshape(BATCH_BLK, T_CHUNK, n_fft)

    # overlap-add this chunk's frames into the local segment
    seg_ref[:] = jnp.zeros_like(seg_ref)

    def body(t, _):
        start = pl.multiple_of(t * hop, hop)
        seg_ref[:, pl.ds(start, n_fft)] = (
            seg_ref[:, pl.ds(start, n_fft)] + frames_ref[:, t, :]
        )
        return 0

    jax.lax.fori_loop(0, T_CHUNK, body, 0)

    # splice in the previous chunk's spill (grid steps run sequentially on
    # TPU, so the scratch carries across the inner t dimension; reset at the
    # start of each batch tile's sweep)
    @pl.when(c == 0)
    def _reset():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    seg_ref[:, :tail_len] = seg_ref[:, :tail_len] + tail_ref[:]
    out_ref[:] = seg_ref[:, : T_CHUNK * hop]
    tail_ref[:] = seg_ref[:, T_CHUNK * hop :]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "interpret"))
def istft_pallas(
    re: jax.Array,  # (B, F, T) real part of the spectrogram
    im: jax.Array,  # (B, F, T) imaginary part
    window: jax.Array,  # (n_fft,) synthesis window
    n_fft: int = 512,
    hop_length: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Windowed overlap-add of the iDFT frames: (B, (T-1)*hop + n_fft).

    Output is the raw (un-normalized) OLA signal; divide by the summed
    squared-window envelope for a full iSTFT (dsp.stft.istft does this).
    """
    if re.ndim != 3:
        raise ValueError(f"expected (batch, freq, time), got {re.shape}")
    if T_CHUNK * hop_length < n_fft - hop_length:
        raise ValueError(
            f"T_CHUNK*hop ({T_CHUNK * hop_length}) must cover the frame "
            f"overlap ({n_fft - hop_length}): single-chunk spill carry"
        )
    b, n_freq, t_frames = re.shape
    if n_freq != n_fft // 2 + 1:
        raise ValueError(f"freq dim {n_freq} != n_fft//2+1 ({n_fft // 2 + 1})")
    b_pad = _round_up(max(b, 1), BATCH_BLK)
    out_len = (t_frames - 1) * hop_length + n_fft
    # zero frames (no OLA contribution) pad T so the chunked sweep both
    # divides evenly and flushes the final n_fft-hop spill through out tiles
    t_flush = -(-(n_fft - hop_length) // hop_length)
    t_pad = _round_up(t_frames + t_flush, T_CHUNK)
    # (B, F, T) -> (B, T, F) for the matmul layout, pad batch + freq lanes
    re_t = jnp.swapaxes(re, -1, -2)
    im_t = jnp.swapaxes(im, -1, -2)
    f_pad = _round_up(n_freq, 128)
    pads = ((0, b_pad - b), (0, t_pad - t_frames), (0, f_pad - n_freq))
    re_t = jnp.pad(re_t, pads)
    im_t = jnp.pad(im_t, pads)

    n = np.arange(n_fft)
    k = np.arange(n_freq)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    fold = np.full((n_freq, 1), 2.0)
    fold[0] = 1.0
    if n_fft % 2 == 0:
        fold[-1] = 1.0
    cos_b = np.zeros((f_pad, n_fft), np.float32)
    sin_b = np.zeros((f_pad, n_fft), np.float32)
    cos_b[:n_freq] = (fold * np.cos(ang) / n_fft).astype(np.float32)
    sin_b[:n_freq] = (-fold * np.sin(ang) / n_fft).astype(np.float32)

    kernel = functools.partial(_istft_kernel, n_fft=n_fft, hop=hop_length)
    n_chunks = t_pad // T_CHUNK
    seg_len = T_CHUNK * hop_length + (n_fft - hop_length)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // BATCH_BLK, n_chunks),
        in_specs=[
            pl.BlockSpec((BATCH_BLK, T_CHUNK, f_pad), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLK, T_CHUNK, f_pad), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_fft), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_fft), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_BLK, T_CHUNK * hop_length), lambda i, c: (i, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_pad, n_chunks * T_CHUNK * hop_length), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((BATCH_BLK, T_CHUNK, n_fft), jnp.float32),
            pltpu.VMEM((BATCH_BLK, seg_len), jnp.float32),
            pltpu.VMEM((BATCH_BLK, n_fft - hop_length), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_pad * t_pad * f_pad * n_fft,
            bytes_accessed=4 * b_pad * (2 * t_pad * f_pad + out_len),
            transcendentals=0,
        ),
    )(re_t, im_t, jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(window, jnp.float32).reshape(1, n_fft))
    return out[:b, :out_len]
