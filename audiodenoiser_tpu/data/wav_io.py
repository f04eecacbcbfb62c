"""WAV decode/encode + resampling on the host (no librosa/soundfile).

The reference loads every clip with ``librosa.load(path, sr=8000)``
(``/root/reference/code/create_train_dataset.py:204,217``) — decode, mono
downmix (channel mean), then high-quality resample — and writes debug/output
wavs with ``soundfile.write`` (16-bit PCM for float input,
``create_train_dataset.py:238``, ``test.py:108``). Neither library is a
dependency here: decoding uses ``scipy.io.wavfile`` with librosa-equivalent
int->float normalization, and resampling uses a polyphase Kaiser filter
(``scipy.signal.resample_poly``) — not bit-identical to librosa's soxr_hq
but well within the float-tolerance target of BASELINE.md.

A native C++ decoder/resampler (``native/``) can be swapped in for the hot
ingest path; this module is the portable reference implementation.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def _to_float32(data: np.ndarray) -> np.ndarray:
    """librosa/soundfile int->float convention: int16/32 scale by 2^(bits-1),
    uint8 centered at 128."""
    if data.dtype == np.float32:
        return data
    if data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    raise ValueError(f"unsupported wav dtype {data.dtype}")


def resample(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return y
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(y, target_sr // g, orig_sr // g).astype(np.float32)


def read_wav(
    path: str, sample_rate: Optional[int] = None, mono: bool = True
) -> tuple[np.ndarray, int]:
    """Load a wav as float32 in [-1, 1]; librosa.load-compatible signature
    semantics (mono downmix by channel mean, resample to ``sample_rate``)."""
    sr, data = wavfile.read(path)
    y = _to_float32(np.asarray(data))
    if mono and y.ndim == 2:
        y = y.mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        y = resample(y, sr, sample_rate)
        sr = sample_rate
    return np.ascontiguousarray(y, dtype=np.float32), sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write 16-bit PCM (soundfile's default WAV subtype for float input)."""
    a = np.asarray(audio, dtype=np.float32)
    pcm = np.clip(a * 32768.0, -32768, 32767).astype(np.int16)
    wavfile.write(path, sample_rate, pcm)


def load_wav_list(dirname: str) -> list[str]:
    """Sorted .wav paths in a directory (create_train_dataset.py:43-49)."""
    return sorted(
        os.path.join(dirname, f)
        for f in os.listdir(dirname)
        if f.lower().endswith(".wav")
    )
