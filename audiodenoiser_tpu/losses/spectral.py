"""The combined "perceptual" spectral loss, jitted end to end.

Reference: ``/root/reference/code/loss.py`` — a 0.4/0.4/0.2 blend of

1. multi-scale STFT L1 (``loss.py:6-35``): the input *spectrogram* is
   collapsed to a pseudo-waveform by averaging over the frequency axis
   (i.e. the T time frames are treated as a T-sample signal), then L1 of
   STFT magnitudes at fft sizes [63, 32, 16] / hops [16, 8, 4] with a
   rectangular window and constant padding, averaged over scales;
2. mel L1 (``loss.py:37-69``): same freq-mean collapse, then a
   torchaudio-style MelSpectrogram (sr=8000, n_fft=63, hop=16, n_mels=64 —
   deliberately degenerate: 64 mel filters over 32 bins) and L1. The
   reference loops over the batch in Python launching one device op per
   sample (``loss.py:60-65``); here the transform is vmapped inside jit —
   numerically identical (the transform is per-sample) with none of the
   host-side launch overhead;
3. plain L1 over the raw spectrogram pair.

All quirks are reproduced on purpose — they define the loss surface the
reference trained against, and the SI-SDR parity target in BASELINE.md
depends on them.

Inputs are NHWC ``(B, F, T, C)`` (this framework's native layout), NCHW-free;
``(B, F, T)`` and unbatched ``(F, T)`` are also accepted.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

import audiodenoiser_tpu.dsp.stft as stft_lib
from audiodenoiser_tpu.dsp.mel import mel_spectrogram

FFT_SIZES = (63, 32, 16)
HOP_LENGTHS = (16, 8, 4)
W_STFT = 0.4
W_MEL = 0.4
W_L1 = 0.2


class CombinedLossOutput(NamedTuple):
    """Mirror of the reference's 4-tuple return (loss.py:95)."""

    total: jax.Array
    stft: jax.Array
    mel: jax.Array
    l1: jax.Array


def _pseudo_waveform(spec: jax.Array) -> jax.Array:
    """Collapse a spectrogram to (B, T) by averaging over frequency.

    Reproduces loss.py:14-20: 4D input is averaged over the freq dim and the
    singleton channel squeezed. NHWC (B, F, T, C) -> mean over F -> (B, T).
    """
    if spec.ndim == 4:  # (B, F, T, C)
        if spec.shape[-1] != 1:
            raise ValueError(f"expected singleton channel, got {spec.shape}")
        return jnp.mean(spec[..., 0], axis=-2)
    if spec.ndim == 3:  # (B, F, T)
        return jnp.mean(spec, axis=-2)
    if spec.ndim == 2:  # (F, T) unbatched
        return jnp.mean(spec, axis=-2)[None, :]
    raise ValueError(f"unsupported spectrogram rank {spec.ndim}")


def multi_scale_stft_loss(
    pred: jax.Array,
    target: jax.Array,
    fft_sizes: Sequence[int] = FFT_SIZES,
    hop_lengths: Sequence[int] = HOP_LENGTHS,
) -> jax.Array:
    p = _pseudo_waveform(pred)
    t = _pseudo_waveform(target)
    loss = 0.0
    for n_fft, hop in zip(fft_sizes, hop_lengths):
        # torch.stft defaults in loss.py:27: center=True, rectangular
        # window, pad_mode='constant', onesided.
        pm = jnp.abs(
            stft_lib.stft(p, n_fft, hop, window="ones", center=True, pad_mode="constant")
        )
        tm = jnp.abs(
            stft_lib.stft(t, n_fft, hop, window="ones", center=True, pad_mode="constant")
        )
        loss = loss + jnp.mean(jnp.abs(pm - tm))
    return loss / len(fft_sizes)


def mel_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    p = _pseudo_waveform(pred)
    t = _pseudo_waveform(target)
    pm = mel_spectrogram(p, sample_rate=8000, n_fft=63, hop_length=16, n_mels=64)
    tm = mel_spectrogram(t, sample_rate=8000, n_fft=63, hop_length=16, n_mels=64)
    return jnp.mean(jnp.abs(pm - tm))


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def combined_perceptual_loss(pred: jax.Array, target: jax.Array) -> CombinedLossOutput:
    """0.4 * stft + 0.4 * mel + 0.2 * l1 (loss.py:71-95)."""
    s = multi_scale_stft_loss(pred, target)
    m = mel_loss(pred, target)
    l1 = l1_loss(pred, target)
    return CombinedLossOutput(W_STFT * s + W_MEL * m + W_L1 * l1, s, m, l1)
