"""Pallas TPU kernel: fused inverse-DFT + window + overlap-add iSTFT.

Mirror of the forward kernel in ``stft_kernel.py``: for each 8-row batch
tile the inverse real DFT runs as two MXU matmuls against constant bases

    frames = Re(S) @ C + Im(S) @ D,
    C[k, n] = w_k cos(2*pi*k*n/N) / N,  D[k, n] = -w_k sin(2*pi*k*n/N) / N,
    w_0 = w_{N/2} = 1, otherwise 2   (the Hermitian-symmetry fold of irfft)

then the synthesis window is applied and frames are overlap-added into the
output row entirely in VMEM — the (T, n_fft) frame tensor (4x the signal
size at the 512/128 default) never exists in HBM. The squared-window
normalization envelope and center trimming stay in ``dsp.stft.istft``
(trace-time constants / cheap slices), which exposes this kernel via
``precision='pallas'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_BLK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _istft_kernel(re_ref, im_ref, cos_ref, sin_ref, win_ref, out_ref,
                  frames_ref, acc_ref,
                  *, n_fft: int, hop: int, t_frames: int, out_len: int):
    f_pad = cos_ref.shape[0]
    re = re_ref[:].reshape(BATCH_BLK * t_frames, f_pad)
    im = im_ref[:].reshape(BATCH_BLK * t_frames, f_pad)
    frames = jnp.dot(re, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    frames = frames + jnp.dot(im, sin_ref[:], preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    # stage windowed frames in VMEM scratch — Mosaic only supports dynamic
    # slicing through refs, not computed values
    frames_ref[:] = (frames * win_ref[0, :]).reshape(BATCH_BLK, t_frames, n_fft)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(t, _):
        start = pl.multiple_of(t * hop, hop)
        acc_ref[:, pl.ds(start, n_fft)] = (
            acc_ref[:, pl.ds(start, n_fft)] + frames_ref[:, t, :]
        )
        return 0

    jax.lax.fori_loop(0, t_frames, body, 0)
    out_ref[:] = acc_ref[:]


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
    b, n_freq, t_frames = re.shape
    if n_freq != n_fft // 2 + 1:
        raise ValueError(f"freq dim {n_freq} != n_fft//2+1 ({n_fft // 2 + 1})")
    b_pad = _round_up(max(b, 1), BATCH_BLK)
    # (B, F, T) -> (B, T, F) for the matmul layout, pad batch + freq lanes
    re_t = jnp.swapaxes(re, -1, -2)
    im_t = jnp.swapaxes(im, -1, -2)
    f_pad = _round_up(n_freq, 128)
    pads = ((0, b_pad - b), (0, 0), (0, f_pad - n_freq))
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

    out_len = (t_frames - 1) * hop_length + n_fft
    kernel = functools.partial(
        _istft_kernel, n_fft=n_fft, hop=hop_length, t_frames=t_frames,
        out_len=out_len,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // BATCH_BLK,),
        in_specs=[
            pl.BlockSpec((BATCH_BLK, t_frames, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLK, t_frames, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_BLK, out_len), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_len), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BATCH_BLK, t_frames, n_fft), jnp.float32),
            pltpu.VMEM((BATCH_BLK, out_len), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_pad * t_frames * f_pad * n_fft,
            bytes_accessed=4 * b_pad * (2 * t_frames * f_pad + out_len),
            transcendentals=0,
        ),
    )(re_t, im_t, jnp.asarray(cos_b), jnp.asarray(sin_b),
      jnp.asarray(window, jnp.float32).reshape(1, n_fft))
    return out[:b]
