"""Batched STFT / iSTFT with librosa-compatible semantics, built for XLA/TPU.

The reference computes STFTs one clip at a time on the CPU with
``librosa.stft`` (``/root/reference/code/create_train_dataset.py:162-174``,
``create_test_dataset.py:35-41``) and inverts them with ``librosa.istft``
(``test.py:40-48``). Here both directions are pure, batched, jittable
functions so featurization and phase reconstruction run *on device*, fused
into the training / inference graphs.

Semantics reproduced exactly (validated in ``tests/test_stft.py`` against a
NumPy golden model and ``torch.stft``):

- periodic Hann analysis window, center-padded to ``n_fft`` when
  ``win_length < n_fft``;
- ``center=True``: the signal is padded with ``n_fft//2`` samples on both
  sides (librosa's default ``pad_mode='constant'`` for stft) and
  ``n_frames = 1 + len(x)//hop``;
- ``center=False``: no padding, ``n_frames = 1 + (len(x)-n_fft)//hop``
  (the training featurization path, ``create_train_dataset.py:171``);
- iSTFT: windowed overlap-add divided by the summed squared window envelope
  (skipping bins where the envelope underflows), then ``n_fft//2`` trimmed
  from both ends when ``center=True``.

TPU notes
---------
- Framing is a static-shape slice-stack; when ``n_fft % hop == 0`` (the
  512/128 default) overlap-add uses a reshape+shift+sum scheme with **no
  scatter**, which XLA lowers to cheap vector adds.
- The window and the inverse window-sum envelope are trace-time NumPy
  constants folded into the compiled program.
- ``precision='matmul'`` lowers the DFT itself onto the MXU as a framed
  matmul against a real DFT basis (the nnAudio trick) — more FLOPs than an
  FFT but fuses framing+window+transform into one systolic-array pass; the
  default uses ``jnp.fft.rfft``.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.dsp.window import hann_window, pad_center

WindowSpec = Union[str, np.ndarray, None]


def _resolve_window(window: WindowSpec, win_length: int, n_fft: int) -> np.ndarray:
    if window is None or (isinstance(window, str) and window == "ones"):
        w = np.ones(win_length, dtype=np.float32)
    elif isinstance(window, str):
        if window != "hann":
            raise ValueError(f"unsupported window {window!r}")
        w = hann_window(win_length)
    else:
        w = np.asarray(window, dtype=np.float32)
        if w.shape != (win_length,):
            raise ValueError(f"window shape {w.shape} != ({win_length},)")
    return pad_center(w, n_fft)


def num_frames(length: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames librosa produces for a signal of ``length``."""
    if center:
        # padded length is length + 2*(n_fft//2); for even n_fft this
        # reduces to 1 + length//hop, but odd n_fft (the mel-loss 63-FFT
        # config) loses one sample of pad on each side
        return 1 + (length + 2 * (n_fft // 2) - n_fft) // hop_length
    if length < n_fft:
        raise ValueError(f"signal length {length} < n_fft {n_fft} with center=False")
    return 1 + (length - n_fft) // hop_length


def frame_signal(x: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """Slice ``x`` (..., samples) into overlapping frames (..., n_frames, n_fft).

    Static-shape implementation: one strided slice per frame phase when the
    hop divides ``n_fft`` (zero-copy reshapes XLA folds away), otherwise a
    single gather.
    """
    length = x.shape[-1]
    t = 1 + (length - n_fft) // hop_length
    if t <= 0:
        raise ValueError(f"signal too short to frame: {length} < {n_fft}")
    if n_fft % hop_length == 0:
        # x[i*hop : i*hop + n_fft] == concat of R consecutive hop-blocks.
        r = n_fft // hop_length
        usable = (t - 1 + r) * hop_length  # samples touched by any frame
        blocks = x[..., :usable].reshape(*x.shape[:-1], t - 1 + r, hop_length)
        # frame i = blocks[i : i+r] flattened
        parts = [blocks[..., i : i + t, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )  # (t, n_fft) trace-time constant
    return x[..., idx]


def _pad_signal(x: jax.Array, n_fft: int, pad_mode: str) -> jax.Array:
    p = n_fft // 2
    pads = [(0, 0)] * (x.ndim - 1) + [(p, p)]
    return jnp.pad(x, pads, mode=pad_mode)


@functools.lru_cache(maxsize=32)
def _rdft_basis(n_fft: int):
    """Real DFT basis for the MXU matmul path: (n_fft, 2*(n_fft//2+1))."""
    n = np.arange(n_fft)
    k = np.arange(n_fft // 2 + 1)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def stft(
    x: jax.Array,
    n_fft: int = 512,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    window: WindowSpec = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    precision: str = "fft",
) -> jax.Array:
    """Short-time Fourier transform of ``x`` (..., samples).

    Returns complex64 of shape (..., n_fft//2 + 1, n_frames) — librosa's
    (freq, time) layout, batched over leading dims.
    """
    win_length = n_fft if win_length is None else win_length
    w = _resolve_window(window, win_length, n_fft)
    if center:
        x = _pad_signal(x, n_fft, pad_mode)
    if precision == "pallas":
        # fused framing+window+DFT TPU kernel (interpret mode off-TPU)
        from audiodenoiser_tpu.ops.pallas import stft_pallas

        batch_shape = x.shape[:-1]
        xb = x.reshape(-1, x.shape[-1])
        re, im = stft_pallas(
            xb,
            jnp.asarray(w),
            n_fft,
            hop_length,
            interpret=jax.default_backend() == "cpu",
        )
        spec = jax.lax.complex(re, im)
        return spec.reshape(*batch_shape, *spec.shape[-2:])
    frames = frame_signal(x, n_fft, hop_length)  # (..., t, n_fft)
    if precision == "matmul":
        cos_b, sin_b = _rdft_basis(n_fft)
        fw = frames * w  # window fuses into the matmul epilogue
        re = jnp.matmul(fw, cos_b, preferred_element_type=jnp.float32)
        im = jnp.matmul(fw, sin_b, preferred_element_type=jnp.float32)
        spec = jax.lax.complex(re, im)
    else:
        spec = jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., freq, time)


def magnitude(spec: jax.Array) -> jax.Array:
    return jnp.abs(spec)


def magphase(spec: jax.Array):
    """librosa.magphase: (magnitude, unit-phase complex).

    Zero-magnitude bins get phase 1 (librosa: exp(1j*angle(0)) == 1), so
    magnitude * phase always reconstructs the input.
    """
    mag = jnp.abs(spec)
    tiny = jnp.finfo(jnp.float32).tiny
    phase = jnp.where(
        mag > tiny,
        spec / jnp.maximum(mag, tiny).astype(spec.dtype),
        jnp.ones((), spec.dtype),
    )
    return mag, phase


@functools.lru_cache(maxsize=64)
def _wss_envelope(
    n_fft: int, hop_length: int, n_frames: int, win_key: bytes, win_length: int
) -> np.ndarray:
    """Summed squared-window envelope (librosa ``window_sumsquare``)."""
    w = np.frombuffer(win_key, dtype=np.float32)
    out_len = n_fft + hop_length * (n_frames - 1)
    wsq = (w.astype(np.float64)) ** 2
    env = np.zeros(out_len, dtype=np.float64)
    for t in range(n_frames):
        env[t * hop_length : t * hop_length + n_fft] += wsq
    tiny = np.finfo(np.float32).tiny
    inv = np.where(env > tiny, 1.0 / np.maximum(env, tiny), 1.0)
    return inv.astype(np.float32)


def overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """Overlap-add (..., n_frames, n_fft) -> (..., (n_frames-1)*hop + n_fft).

    Scatter-free when ``hop | n_fft``: each frame is split into
    ``R = n_fft//hop`` hop-blocks and the R shifted block-streams are summed.
    """
    t, n_fft = frames.shape[-2], frames.shape[-1]
    out_len = (t - 1) * hop_length + n_fft
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        blocks = frames.reshape(*frames.shape[:-1], r, hop_length)
        total_blocks = t - 1 + r
        acc = jnp.zeros((*frames.shape[:-2], total_blocks, hop_length), frames.dtype)
        for i in range(r):
            pads = [(0, 0)] * (frames.ndim - 2) + [(i, r - 1 - i), (0, 0)]
            acc = acc + jnp.pad(blocks[..., :, i, :], pads)
        return acc.reshape(*frames.shape[:-2], out_len)
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    out = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype)
    return out.at[..., idx].add(frames)


def istft(
    spec: jax.Array,
    hop_length: int = 128,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: WindowSpec = "hann",
    center: bool = True,
    length: Optional[int] = None,
    precision: str = "fft",
) -> jax.Array:
    """Inverse STFT of ``spec`` (..., freq, time) -> (..., samples).

    Matches ``librosa.istft`` (windowed overlap-add, squared-window
    normalization, center trimming) for the default hann/center=True setup
    used at ``/root/reference/code/test.py:40``. ``precision='pallas'``
    fuses iDFT+window+overlap-add into one TPU kernel.
    """
    n_fft = 2 * (spec.shape[-2] - 1) if n_fft is None else n_fft
    win_length = n_fft if win_length is None else win_length
    w = _resolve_window(window, win_length, n_fft)
    if precision == "pallas":
        from audiodenoiser_tpu.ops.pallas import istft_pallas

        batch_shape = spec.shape[:-2]
        sb = spec.reshape(-1, *spec.shape[-2:])
        y = istft_pallas(
            jnp.real(sb),
            jnp.imag(sb),
            jnp.asarray(w),
            n_fft,
            hop_length,
            interpret=jax.default_backend() == "cpu",
        )
        y = y.reshape(*batch_shape, y.shape[-1])
    else:
        frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
        frames = frames * w
        y = overlap_add(frames, hop_length)
    n_frames = spec.shape[-1]
    inv_env = _wss_envelope(n_fft, hop_length, n_frames, w.tobytes(), win_length)
    y = y * inv_env
    if center:
        y = y[..., n_fft // 2 : y.shape[-1] - n_fft // 2]
    if length is not None:
        cur = y.shape[-1]
        if cur > length:
            y = y[..., :length]
        elif cur < length:
            pads = [(0, 0)] * (y.ndim - 1) + [(0, length - cur)]
            y = jnp.pad(y, pads)
    return y
