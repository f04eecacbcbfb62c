"""The four noise-corruption kernels, as batched jittable JAX ops.

Reference semantics (``/root/reference/code/create_train_dataset.py:105-159``,
duplicated at ``create_test_dataset.py:79-133``):

- **white**: standard-normal noise scaled so the mixture hits ``snr_db``;
- **urban**: a real noise clip tiled / randomly snipped to length, then
  SNR-scaled;
- **reverb**: Pedalboard (JUCE) ``Reverb(room_size=0.9, damping=0.9,
  wet_level=0.33|0.35)``;
- **noise_cancellation**: with p=0.8 per 2 s block, add ``-0.8 x clean`` over
  the first 8 000 samples of the block (destructive interference).

All outputs are clipped to [-1, 1]. SNR scaling reproduces the reference's
exact arithmetic (eps inside the RMS sqrt, the 1e-9 guard, 20*log10 SNR).

TPU-first design: instead of the reference's per-chunk Python loops, every
kernel here maps over a batch of fixed-length chunks inside jit, so noisy
training pairs are synthesized *on device* in the input pipeline. The JUCE
reverb is a fixed-parameter LTI filter network (8 parallel feedback combs
into 4 series allpasses), so its exact impulse response is precomputed once
on the host (scipy.lfilter cascade, cached) and applied on device as an FFT
convolution — O(N log N) on the VPU rather than a 16 000-step sequential
scan. Divergence from Pedalboard: JUCE smooths parameter changes over the
first ~10 ms after ``setParameters``; we treat parameters as constant (pure
LTI). Bit parity with the C++ plugin is impossible either way; equivalence
is validated by energy-envelope/RT60 tests (``tests/test_noise.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SNR_DB = 8.0
BLOCK = 16000  # 2 s at 8 kHz — the reference's cancellation block
HALF_BLOCK = 8000

# JUCE Reverb constants (juce_Reverb.h, wrapped by pedalboard.Reverb)
_COMB_TUNINGS_44K = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
_ALLPASS_TUNINGS_44K = (556, 441, 341, 225)
_FIXED_GAIN = 0.015
_WET_SCALE = 3.0
_DRY_SCALE = 2.0
_ROOM_SCALE = 0.28
_ROOM_OFFSET = 0.7
_DAMP_SCALE = 0.4


def snr_scale(clean: jax.Array, noise: jax.Array, snr_db: float = SNR_DB) -> jax.Array:
    """Scale ``noise`` so that mixing with ``clean`` yields ``snr_db`` dB SNR.

    Exact port of the arithmetic at create_train_dataset.py:148-155, batched
    over leading dims (RMS per example).
    """
    clean_rms = jnp.sqrt(jnp.mean(clean**2, axis=-1, keepdims=True) + 1e-12)
    noise_rms = jnp.sqrt(jnp.mean(noise**2, axis=-1, keepdims=True) + 1e-12)
    snr_linear = 10.0 ** (snr_db / 20.0)
    desired = clean_rms / snr_linear
    scaled = noise * (desired / noise_rms)
    return jnp.where(noise_rms > 1e-9, scaled, jnp.zeros_like(noise))


def white(key: jax.Array, clean: jax.Array, snr_db: float = SNR_DB) -> jax.Array:
    """White-noise corruption at ``snr_db`` (create_train_dataset.py:139-157)."""
    noise = jax.random.normal(key, clean.shape, dtype=clean.dtype)
    return jnp.clip(clean + snr_scale(clean, noise, snr_db), -1.0, 1.0)


def match_length(key: jax.Array, noise: jax.Array, target_len: int) -> jax.Array:
    """Tile (if short) or randomly snip (if long) ``noise`` to ``target_len``.

    Mirrors match_audio_length (create_train_dataset.py:52-68). The noise
    clip length is static, so the tile/snip decision resolves at trace time;
    only the snippet start is random.
    """
    n = noise.shape[-1]
    if n == target_len:
        return noise
    if n < target_len:
        reps = -(-target_len // n)
        tiled = jnp.tile(noise, (*([1] * (noise.ndim - 1)), reps))
        return tiled[..., :target_len]
    start = jax.random.randint(key, (), 0, n - target_len)
    return jax.lax.dynamic_slice_in_dim(noise, start, target_len, axis=-1)


def urban(
    key: jax.Array, clean: jax.Array, noise_clip: jax.Array, snr_db: float = SNR_DB
) -> jax.Array:
    """Urban-noise corruption: length-matched real noise at ``snr_db``."""
    noise = match_length(key, noise_clip, clean.shape[-1])
    noise = jnp.broadcast_to(noise, clean.shape).astype(clean.dtype)
    return jnp.clip(clean + snr_scale(clean, noise, snr_db), -1.0, 1.0)


def noise_cancellation(key: jax.Array, clean: jax.Array) -> jax.Array:
    """Destructive-interference corruption (create_train_dataset.py:124-135).

    Per 16 000-sample block, with probability 0.8 the first
    min(8 000, block_len) samples get ``-0.8 x clean`` added.
    """
    length = clean.shape[-1]
    n_blocks = -(-length // BLOCK)
    gate = jax.random.bernoulli(key, 0.8, (*clean.shape[:-1], n_blocks))
    pos = jnp.arange(length)
    in_half = (pos % BLOCK) < HALF_BLOCK
    block_id = pos // BLOCK
    active = jnp.take_along_axis(
        gate.astype(clean.dtype),
        jnp.broadcast_to(block_id, (*clean.shape[:-1], length)),
        axis=-1,
    )
    mask = active * in_half.astype(clean.dtype)
    return jnp.clip(clean + mask * (-0.8) * clean, -1.0, 1.0)


@functools.lru_cache(maxsize=16)
def reverb_impulse_response(
    sample_rate: int,
    length: int,
    room_size: float = 0.9,
    damping: float = 0.9,
    wet_level: float = 0.33,
    width: float = 1.0,
) -> np.ndarray:
    """Exact wet-path impulse response of the JUCE/Pedalboard mono reverb.

    Each comb is the rational filter
    ``z^-D (1 - d z^-1) / (1 - d z^-1 - f (1-d) z^-D)`` (D = delay, d = damp,
    f = feedback), each allpass ``(1.5 z^-D - 1)/(1 - 0.5 z^-D)`` — derived
    from JUCE's CombFilter/AllPassFilter recurrences. Host-side scipy
    cascade on a unit impulse, cached per configuration.
    """
    from scipy.signal import lfilter

    feedback = room_size * _ROOM_SCALE + _ROOM_OFFSET
    damp = damping * _DAMP_SCALE
    wet1 = 0.5 * (wet_level * _WET_SCALE) * (1.0 + width)

    x = np.zeros(length, dtype=np.float64)
    x[0] = _FIXED_GAIN  # input gain folds into the IR

    comb_sum = np.zeros(length, dtype=np.float64)
    for tuning in _COMB_TUNINGS_44K:
        d_len = int(sample_rate) * tuning // 44100
        b = np.zeros(d_len + 2)
        b[d_len] = 1.0
        b[d_len + 1] = -damp
        a = np.zeros(d_len + 1)
        a[0] = 1.0
        a[1] = -damp
        a[d_len] = -feedback * (1.0 - damp)
        comb_sum += lfilter(b, a, x)

    out = comb_sum
    for tuning in _ALLPASS_TUNINGS_44K:
        d_len = int(sample_rate) * tuning // 44100
        b = np.zeros(d_len + 1)
        b[0] = -1.0
        b[d_len] = 1.5
        a = np.zeros(d_len + 1)
        a[0] = 1.0
        a[d_len] = -0.5
        out = lfilter(b, a, out)

    return (out * wet1).astype(np.float32)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def reverb(
    clean: jax.Array,
    sample_rate: int = 8000,
    room_size: float = 0.9,
    damping: float = 0.9,
    wet_level: float = 0.33,
    dry_level: float = 0.4,
) -> jax.Array:
    """Pedalboard-style reverb corruption (create_train_dataset.py:87-102,117-121).

    wet_level=0.33 is the train-builder setting; the test builder uses 0.35
    (create_test_dataset.py:68).
    """
    length = clean.shape[-1]
    ir = reverb_impulse_response(sample_rate, length, room_size, damping, wet_level)
    dry_gain = dry_level * _DRY_SCALE
    fft_len = _next_pow2(2 * length - 1)
    spec = jnp.fft.rfft(clean, n=fft_len, axis=-1) * jnp.fft.rfft(
        jnp.asarray(ir), n=fft_len
    )
    wet = jnp.fft.irfft(spec, n=fft_len, axis=-1)[..., :length]
    return jnp.clip(dry_gain * clean + wet, -1.0, 1.0)


def add_noise(
    key: jax.Array,
    clean: jax.Array,
    noise_type: str,
    noise_clip: jax.Array | None = None,
    snr_db: float = SNR_DB,
    sample_rate: int = 8000,
    reverb_wet_level: float = 0.33,
) -> jax.Array:
    """Dispatch mirroring add_noise (create_train_dataset.py:105-159)."""
    if noise_type == "white":
        return white(key, clean, snr_db)
    if noise_type == "urban":
        if noise_clip is None or noise_clip.shape[-1] == 0:
            noise_clip = jnp.zeros_like(clean)
        return urban(key, clean, noise_clip, snr_db)
    if noise_type == "reverb":
        return reverb(clean, sample_rate, wet_level=reverb_wet_level)
    if noise_type == "noise_cancellation":
        return noise_cancellation(key, clean)
    raise ValueError(f"unknown noise type {noise_type!r}")
