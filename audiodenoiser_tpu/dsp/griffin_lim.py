"""Phase reconstruction from magnitude spectrograms, on device.

The reference reconstructs audio with a CPU loop of 50 librosa
istft/stft round-trips seeded with random phase
(``/root/reference/code/test.py:29-48``). Two quirks matter:

1. It is **not** true Griffin-Lim — the measured magnitude is never
   re-imposed (``test.py:44-46`` rebuilds the spectrogram from the
   round-trip's own magnitude), so after one iteration it merely relaxes the
   random-phase estimate toward an istft/stft fixed point.
2. It runs one clip at a time on the host.

Here both the *correct* Griffin-Lim update (magnitude re-imposed each step,
optionally with momentum à la librosa.griffinlim) and a ``reference`` mode
replicating quirk (1) are provided as a single jitted ``lax.fori_loop`` over
batched on-device FFTs, so reconstruction fuses with the model forward pass
into one inference graph.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from audiodenoiser_tpu.dsp.stft import istft, stft


@partial(
    jax.jit,
    static_argnames=(
        "n_fft",
        "hop_length",
        "n_iter",
        "mode",
        "momentum",
        "length",
    ),
)
def griffin_lim(
    magnitude: jax.Array,
    key: jax.Array,
    n_fft: Optional[int] = None,
    hop_length: int = 128,
    n_iter: int = 50,
    mode: str = "correct",
    momentum: float = 0.0,
    length: Optional[int] = None,
) -> jax.Array:
    """Reconstruct audio (..., samples) from ``magnitude`` (..., freq, time).

    mode='correct'   true Griffin-Lim (re-imposes the target magnitude)
    mode='reference' replicates the reference loop at test.py:39-46
    """
    if mode not in ("correct", "reference"):
        raise ValueError(f"unknown mode {mode!r}")
    n_fft = 2 * (magnitude.shape[-2] - 1) if n_fft is None else n_fft

    theta = jax.random.uniform(key, magnitude.shape, minval=0.0, maxval=2.0 * jnp.pi)
    spec = magnitude.astype(jnp.complex64) * jnp.exp(1j * theta)

    tiny = jnp.finfo(jnp.float32).tiny

    def body(_, carry):
        cur, prev = carry
        if momentum > 0.0:
            accel = cur + momentum * (cur - prev)
        else:
            accel = cur
        audio = istft(accel, hop_length=hop_length, n_fft=n_fft, center=True)
        rebuilt = stft(audio, n_fft=n_fft, hop_length=hop_length, center=True)
        if mode == "correct":
            phase = rebuilt / jnp.maximum(jnp.abs(rebuilt), tiny)
            nxt = magnitude.astype(jnp.complex64) * phase
        else:
            nxt = rebuilt
        return nxt, cur

    spec, _ = jax.lax.fori_loop(0, n_iter, body, (spec, spec))
    return istft(spec, hop_length=hop_length, n_fft=n_fft, center=True, length=length)
