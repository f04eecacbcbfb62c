"""ctypes bindings for the native C++ audio-ingest runtime (native/).

Builds ``libaudioio.so`` on first use (g++, cached) and exposes:

- ``load_wav(path, sample_rate)`` — decode + mono downmix + polyphase
  resample, scipy-resample_poly-compatible (tests/test_native.py asserts
  float-level agreement with the Python path in ``wav_io``);
- ``load_batch(paths, sample_rate, chunk_samples)`` — parallel multi-file
  decode straight into a rectangular (n_chunks, chunk) float32 array, the
  shape the on-device pipeline consumes.

Falls back gracefully: ``available()`` returns False when no compiler or
the build fails, and callers keep using the scipy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    native_dir = os.path.abspath(_NATIVE_DIR)
    so_path = os.path.join(native_dir, "libaudioio.so")
    src = os.path.join(native_dir, "audioio.cpp")
    if not os.path.exists(src):
        return None
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["make", "-C", native_dir],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.adio_version.restype = ctypes.c_int
    lib.adio_load_wav.restype = ctypes.c_int
    lib.adio_load_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.adio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.adio_load_batch.restype = ctypes.c_int64
    lib.adio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            if os.environ.get("ADT_DISABLE_NATIVE") != "1":
                _LIB = _build_and_load()
        return _LIB


def available() -> bool:
    return _get() is not None


def load_wav(path: str, sample_rate: Optional[int] = None) -> np.ndarray:
    lib = _get()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.adio_load_wav(
        path.encode(), int(sample_rate or 0), ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise IOError(f"native decode failed for {path} (rc={rc})")
    try:
        return np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.adio_free(out)


def load_batch(
    paths: Sequence[str], sample_rate: int, chunk_samples: int
) -> np.ndarray:
    """Parallel decode+resample+chunk -> (n_chunks, chunk_samples) float32."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native audioio unavailable")
    if not paths:
        return np.zeros((0, chunk_samples), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.adio_load_batch(
        arr, len(paths), int(sample_rate), int(chunk_samples), ctypes.byref(out)
    )
    if n < 0:
        raise IOError(f"native batch decode failed (rc={n})")
    try:
        return np.ctypeslib.as_array(out, shape=(n, chunk_samples)).copy()
    finally:
        lib.adio_free(out)
