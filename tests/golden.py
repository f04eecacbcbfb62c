"""Independent NumPy golden models of librosa's STFT/iSTFT semantics.

Written directly from librosa's documented algorithm (frame, window, rfft;
windowed overlap-add with squared-window normalization) so the library code
in ``audiodenoiser_tpu.dsp`` is validated against an implementation that
shares no code with it. torch.stft/torch.istft provide a third, fully
independent cross-check in test_stft.py.
"""

import numpy as np


def hann(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float64)


def np_stft(x, n_fft, hop, window=None, center=True, pad_mode="constant"):
    w = hann(n_fft) if window is None else np.asarray(window, dtype=np.float64)
    if center:
        x = np.pad(x, n_fft // 2, mode=pad_mode)
    t = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop : i * hop + n_fft] for i in range(t)])
    return np.fft.rfft(frames * w, axis=-1).T  # (freq, time)


def np_istft(spec, hop, window=None, center=True):
    n_fft = 2 * (spec.shape[0] - 1)
    w = hann(n_fft) if window is None else np.asarray(window, dtype=np.float64)
    frames = np.fft.irfft(spec.T, n=n_fft, axis=-1) * w
    t = frames.shape[0]
    out_len = (t - 1) * hop + n_fft
    y = np.zeros(out_len)
    env = np.zeros(out_len)
    for i in range(t):
        y[i * hop : i * hop + n_fft] += frames[i]
        env[i * hop : i * hop + n_fft] += w**2
    good = env > np.finfo(np.float32).tiny
    y[good] /= env[good]
    if center:
        y = y[n_fft // 2 : out_len - n_fft // 2]
    return y
