"""Audio quality metrics.

``si_sdr`` is jittable and runs on device inside eval graphs. ``stoi`` is
a self-contained NumPy implementation of the short-time objective
intelligibility measure (Taal, Hendriks, Heusdens & Jensen 2011): its
silent-frame removal makes the working shapes data-dependent, which XLA
cannot compile statically, and it is an offline quality metric — so it
runs on host over the already-fetched waveforms. The reference project
computes no waveform-domain quality metrics at all
(/root/reference/code/test.py writes spectral-loss values only); both
metrics are capability extensions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# STOI constants (Taal et al. 2011, table of parameters)
_STOI_FS = 10000  # internal sample rate (Hz)
_STOI_FRAME = 256  # analysis frame (25.6 ms)
_STOI_HOP = 128
_STOI_NFFT = 512
_STOI_NBANDS = 15  # one-third octave bands
_STOI_MINFREQ = 150.0  # center frequency of the first band (Hz)
_STOI_SEG = 30  # frames per short-time segment (384 ms)
_STOI_BETA = -15.0  # lower SDR clipping bound (dB)
_STOI_DYN_RANGE = 40.0  # silent-frame energy range (dB)
_EPS = np.finfo(np.float64).eps


def _stoi_window() -> np.ndarray:
    # symmetric Hann without its zero endpoints (MATLAB hanning(N))
    return np.hanning(_STOI_FRAME + 2)[1:-1]


def _frame(x: np.ndarray) -> np.ndarray:
    """(n,) -> (M, frame) windowed frames at 50% overlap."""
    w = _stoi_window()
    n_frames = max(0, (len(x) - _STOI_FRAME) // _STOI_HOP + 1)
    idx = (
        np.arange(_STOI_FRAME)[None, :]
        + _STOI_HOP * np.arange(n_frames)[:, None]
    )
    return x[idx] * w


def _remove_silent_frames(x: np.ndarray, y: np.ndarray):
    """Drop frames whose *clean* energy is >40 dB below the loudest frame,
    rebuilding both signals by overlap-add of the retained frames (the
    original MATLAB/pystoi behavior)."""
    xf, yf = _frame(x), _frame(y)
    if len(xf) == 0:
        return x, y
    energies = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + _EPS)
    mask = energies > energies.max() - _STOI_DYN_RANGE
    xf, yf = xf[mask], yf[mask]
    if len(xf) == 0:
        return np.zeros(0), np.zeros(0)
    # OLA of the once-windowed retained frames: a Hann window at 50%
    # overlap sums to unity, so this reconstructs the signal with the
    # silent stretches excised (no extra weight compensation needed)
    n_out = (len(xf) - 1) * _STOI_HOP + _STOI_FRAME
    x_sil = np.zeros(n_out)
    y_sil = np.zeros(n_out)
    for i in range(len(xf)):
        s = i * _STOI_HOP
        x_sil[s : s + _STOI_FRAME] += xf[i]
        y_sil[s : s + _STOI_FRAME] += yf[i]
    return x_sil, y_sil


def _third_octave_matrix() -> np.ndarray:
    """(15, 257) binary band matrix over rfft bins at 10 kHz / nfft 512."""
    f = np.linspace(0, _STOI_FS, _STOI_NFFT + 1)[: _STOI_NFFT // 2 + 1]
    cf = _STOI_MINFREQ * 2.0 ** (np.arange(_STOI_NBANDS) / 3.0)
    f_low = cf * 2.0 ** (-1.0 / 6.0)
    f_high = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((_STOI_NBANDS, len(f)))
    for k in range(_STOI_NBANDS):
        lo = int(np.argmin(np.square(f - f_low[k])))
        hi = int(np.argmin(np.square(f - f_high[k])))
        obm[k, lo:hi] = 1.0
    return obm


def _resample(x: np.ndarray, fs: int) -> np.ndarray:
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(_STOI_FS, int(fs))
    return resample_poly(x, frac.numerator, frac.denominator)


def stoi(reference: np.ndarray, estimate: np.ndarray, fs: int = 8000) -> float:
    """Short-time objective intelligibility of ``estimate`` given the clean
    ``reference`` (both 1-D, same length, any sample rate). Returns a scalar
    that correlates monotonically with intelligibility, ~1.0 for a clean
    signal and decreasing with degradation.
    """
    reference = np.asarray(reference, np.float64).ravel()
    estimate = np.asarray(estimate, np.float64).ravel()
    if reference.shape != estimate.shape:
        raise ValueError(
            f"shape mismatch: {reference.shape} vs {estimate.shape}"
        )
    if fs != _STOI_FS:
        reference = _resample(reference, fs)
        estimate = _resample(estimate, fs)

    reference, estimate = _remove_silent_frames(reference, estimate)
    xf, yf = _frame(reference), _frame(estimate)
    if len(xf) < _STOI_SEG:
        raise ValueError(
            f"not enough active frames for STOI: {len(xf)} < {_STOI_SEG} "
            f"(need >= {_STOI_SEG * _STOI_HOP / _STOI_FS:.2f} s of "
            "non-silent audio)"
        )
    obm = _third_octave_matrix()
    # one-third octave band magnitudes, (bands, frames)
    x_tob = np.sqrt(obm @ np.square(np.abs(np.fft.rfft(xf, _STOI_NFFT).T)))
    y_tob = np.sqrt(obm @ np.square(np.abs(np.fft.rfft(yf, _STOI_NFFT).T)))

    m = x_tob.shape[1] - _STOI_SEG + 1
    # (segments, bands, SEG) sliding windows
    seg_idx = np.arange(_STOI_SEG)[None, :] + np.arange(m)[:, None]
    x_seg = np.transpose(x_tob[:, seg_idx], (1, 0, 2))
    y_seg = np.transpose(y_tob[:, seg_idx], (1, 0, 2))

    norm_c = np.linalg.norm(x_seg, axis=2, keepdims=True) / (
        np.linalg.norm(y_seg, axis=2, keepdims=True) + _EPS
    )
    y_prim = np.minimum(
        y_seg * norm_c, x_seg * (1.0 + 10.0 ** (-_STOI_BETA / 20.0))
    )

    x_c = x_seg - x_seg.mean(axis=2, keepdims=True)
    y_c = y_prim - y_prim.mean(axis=2, keepdims=True)
    x_c = x_c / (np.linalg.norm(x_c, axis=2, keepdims=True) + _EPS)
    y_c = y_c / (np.linalg.norm(y_c, axis=2, keepdims=True) + _EPS)
    return float(np.mean(np.sum(x_c * y_c, axis=2)))


def si_sdr(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-8):
    """Scale-invariant SDR in dB over the last axis (batched).

    The BASELINE.md quality criterion ("SI-SDR within 0.1 dB of the PyTorch
    reference") is measured with this. Standard definition: project the
    estimate onto the reference, compare target energy to residual energy.
    """
    ref_energy = jnp.sum(reference**2, axis=-1, keepdims=True)
    alpha = jnp.sum(estimate * reference, axis=-1, keepdims=True) / (ref_energy + eps)
    target = alpha * reference
    noise = estimate - target
    ratio = jnp.sum(target**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)
