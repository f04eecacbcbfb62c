"""Offline dataset builders emitting reference-compatible ``.npy`` artifacts.

These are the flag-compatible equivalents of
``/root/reference/code/create_train_dataset.py`` (per-chunk
``noisy_{nt}_chunk_{i}.npy`` / ``clean_{nt}_chunk_{i}.npy`` under
``{output}/{noise_type}/``, float32, STFT center=False, plus <=2 debug wavs
per noise type) and ``create_test_dataset.py`` (whole-clip corruption,
STFT center=True, stacked ``clean_{nt}.npy`` / ``noisy_{nt}.npy``).

TPU-first restructuring: the reference corrupts and STFTs one chunk at a
time on the CPU (reloading a noise wav *per frame*,
``create_train_dataset.py:215-219``); here clean chunks are batched into
rectangular arrays, each noise wav is decoded once into a device-resident
``NoiseBank``, and corruption + double STFT for a whole batch runs as one
jitted device call per noise type. Only file writes stay on the host.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

import audiodenoiser_tpu.dsp.stft as stft_lib
from audiodenoiser_tpu.data.chunking import frame_audio
from audiodenoiser_tpu.data.pipeline import NoiseBank
from audiodenoiser_tpu.data.wav_io import load_wav_list, read_wav, write_wav
from audiodenoiser_tpu.dsp import noise as noise_lib

NOISE_TYPES = ("white", "urban", "reverb", "noise_cancellation")


@functools.partial(
    jax.jit,
    static_argnames=("noise_type", "n_fft", "hop_length", "center", "sample_rate",
                     "snr_db", "reverb_wet_level"),
)
def _corrupt_and_featurize(
    key,
    clean,  # (B, L)
    noise_segs,  # (B, L) pre-matched urban segments (ignored otherwise)
    noise_type: str,
    n_fft: int,
    hop_length: int,
    center: bool,
    sample_rate: int,
    snr_db: float,
    reverb_wet_level: float,
):
    b = clean.shape[0]
    if noise_type == "white":
        keys = jax.random.split(key, b)
        noisy = jax.vmap(lambda k, c: noise_lib.white(k, c, snr_db))(keys, clean)
    elif noise_type == "urban":
        scaled = noise_lib.snr_scale(clean, noise_segs, snr_db)
        noisy = jnp.clip(clean + scaled, -1.0, 1.0)
    elif noise_type == "reverb":
        noisy = noise_lib.reverb(clean, sample_rate, wet_level=reverb_wet_level)
    else:
        noisy = noise_lib.noise_cancellation(key, clean)
    to_mag = lambda a: jnp.abs(
        stft_lib.stft(a, n_fft, hop_length, center=center)
    ).astype(jnp.float32)
    return noisy, to_mag(clean), to_mag(noisy)


def _load_clean_chunks(
    clean_files: Sequence[str], sample_rate: int, chunk_samples: int
) -> np.ndarray:
    all_chunks = []
    for cf in clean_files:
        y, _ = read_wav(cf, sample_rate=sample_rate)
        chunks = frame_audio(y, chunk_samples, chunk_samples)
        if len(chunks):
            all_chunks.append(chunks)
    if not all_chunks:
        return np.zeros((0, chunk_samples), dtype=np.float32)
    return np.concatenate(all_chunks, axis=0)


def load_clean_chunks(
    clean_files: Sequence[str], sample_rate: int, chunk_samples: int
) -> np.ndarray:
    """Decode+resample+chunk clean files, preferring the native C++ runtime
    (parallel across files; see native/audioio.cpp) with scipy fallback."""
    from audiodenoiser_tpu.data import native

    if native.available():
        try:
            return native.load_batch(list(clean_files), sample_rate, chunk_samples)
        except IOError:
            pass  # e.g. an exotic wav subtype: fall back per-file
    return _load_clean_chunks(clean_files, sample_rate, chunk_samples)


def build_train_dataset(
    clean_dir: str,
    noise_dir: str,
    output_base: str,
    chunk_seconds: float = 2.0,
    sample_rate: int = 8000,
    n_fft: int = 512,
    hop_length: int = 128,
    snr_db: float = 8.0,
    noise_types: Sequence[str] = NOISE_TYPES,
    num_debug_wav: int = 2,
    debug_dir: str | None = None,
    seed: int = 0,
    device_batch: int = 256,
) -> int:
    """Build the training set; returns the number of chunks processed."""
    chunk_samples = int(sample_rate * chunk_seconds)
    clean_files = load_wav_list(clean_dir)
    noise_files = load_wav_list(noise_dir)
    for nt in noise_types:
        os.makedirs(os.path.join(output_base, nt), exist_ok=True)
    if debug_dir:
        os.makedirs(debug_dir, exist_ok=True)

    chunks = load_clean_chunks(clean_files, sample_rate, chunk_samples)
    n = len(chunks)
    if n == 0:
        return 0

    bank = (
        NoiseBank(
            [read_wav(f, sample_rate=sample_rate)[0] for f in noise_files],
            target_len=chunk_samples,
        )
        if noise_files
        else None
    )

    key = jax.random.key(seed)
    debug_counts = {nt: 0 for nt in noise_types}
    for start in range(0, n, device_batch):
        batch = jnp.asarray(chunks[start : start + device_batch])
        key, k_seg, *nt_keys = jax.random.split(key, 2 + len(noise_types))
        segs = (
            bank.sample(k_seg, batch.shape[0])
            if bank is not None
            else jnp.zeros_like(batch)
        )
        for nt, k in zip(noise_types, nt_keys):
            noisy_audio, clean_mag, noisy_mag = _corrupt_and_featurize(
                k, batch, segs, nt, n_fft, hop_length, False, sample_rate,
                snr_db, 0.33,
            )
            clean_mag = np.asarray(clean_mag)
            noisy_mag = np.asarray(noisy_mag)
            subdir = os.path.join(output_base, nt)
            for j in range(batch.shape[0]):
                i = start + j
                np.save(os.path.join(subdir, f"noisy_{nt}_chunk_{i}.npy"), noisy_mag[j])
                np.save(os.path.join(subdir, f"clean_{nt}_chunk_{i}.npy"), clean_mag[j])
            if debug_dir:
                noisy_np = np.asarray(noisy_audio)
                while debug_counts[nt] < num_debug_wav and debug_counts[nt] < len(noisy_np):
                    c = debug_counts[nt]
                    write_wav(
                        os.path.join(debug_dir, f"debug_{nt}_{c}.wav"),
                        noisy_np[c],
                        sample_rate,
                    )
                    debug_counts[nt] += 1
    return n


def build_test_dataset(
    clean_dir: str,
    noise_dir: str,
    output_dir: str,
    sample_rate: int = 8000,
    n_fft: int = 512,
    hop_length: int = 128,
    snr_db: float = 8.0,
    noise_types: Sequence[str] = NOISE_TYPES,
    reverb_wet_level: float = 0.35,  # create_test_dataset.py:68
    seed: int = 0,
    save_audio: bool = True,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Whole-clip corruption; writes clean_{nt}.npy / noisy_{nt}.npy stacks.

    Like the reference (create_test_dataset.py:135-154), all clean clips are
    assumed equal length (IRMAS 3 s); unequal lengths are truncated to the
    shortest so the stacked (N, F, T) array stays rectangular instead of the
    reference's silent ragged-object-array failure (SURVEY.md §3.5).

    ``save_audio`` additionally writes ``clean_audio.npy`` and
    ``noisy_audio_{nt}.npy`` waveform stacks — the reference's
    magnitude-only artifacts discard phase, which makes a true SI-SDR
    quality gate impossible at eval time; with the waveforms present the
    eval driver scores noisy-phase reconstructions against the real clean
    signal (eval/runner.test_single_noise_type).
    """
    os.makedirs(output_dir, exist_ok=True)
    clean_files = load_wav_list(clean_dir)
    noise_files = load_wav_list(noise_dir)
    clips = [read_wav(f, sample_rate=sample_rate)[0] for f in clean_files]
    if not clips:
        return {}
    min_len = min(len(c) for c in clips)
    clean = jnp.asarray(np.stack([c[:min_len] for c in clips]))
    bank = (
        NoiseBank(
            [read_wav(f, sample_rate=sample_rate)[0] for f in noise_files],
            target_len=min_len,
        )
        if noise_files
        else None
    )

    key = jax.random.key(seed)
    out = {}
    if save_audio:
        np.save(os.path.join(output_dir, "clean_audio.npy"), np.asarray(clean))
    for nt in noise_types:
        key, k_seg, k_mix = jax.random.split(key, 3)
        segs = (
            bank.sample(k_seg, clean.shape[0])
            if (bank is not None and nt == "urban")
            else jnp.zeros_like(clean)
        )
        noisy, clean_mag, noisy_mag = _corrupt_and_featurize(
            k_mix, clean, segs, nt, n_fft, hop_length, True, sample_rate,
            snr_db, reverb_wet_level,
        )
        clean_mag, noisy_mag = np.asarray(clean_mag), np.asarray(noisy_mag)
        np.save(os.path.join(output_dir, f"clean_{nt}.npy"), clean_mag)
        np.save(os.path.join(output_dir, f"noisy_{nt}.npy"), noisy_mag)
        if save_audio:
            np.save(
                os.path.join(output_dir, f"noisy_audio_{nt}.npy"),
                np.asarray(noisy),
            )
        out[nt] = (clean_mag, noisy_mag)
    return out
