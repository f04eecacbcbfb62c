"""Generate the synthetic 8 kHz "music" library used by docs/WORKFLOW_RUN.md.

This zero-egress environment has no IRMAS download, so the end-to-end
workflow runs stand on a reproducible synthetic stand-in: harmonic tones
with ADSR-ish envelopes + vibrato ("instruments"), plus band-limited noise
clips for the urban bank. Layout matches what `cli.install` produces:

    <root>/data/train/clean/*.wav   60 x 6 s clean clips
    <root>/data/train/noise/*.wav   4 band-limited noise clips
    <root>/data/test/clean/*.wav    8 x 3 s clean clips
    <root>/data/test/noise/*.wav    same noise clips

Usage: python examples/make_synthetic_library.py --root ./data_src [--sr 8000]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from audiodenoiser_tpu.data.wav_io import write_wav


def music_clip(rng: np.random.Generator, seconds: float, sr: int) -> np.ndarray:
    """A few overlapping 'notes': harmonic stacks with envelopes + vibrato."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    out = np.zeros(n, np.float64)
    for _ in range(rng.integers(4, 9)):
        f0 = rng.uniform(80, 800)
        start = rng.uniform(0, seconds * 0.8)
        dur = rng.uniform(0.4, seconds - start)
        seg = (t >= start) & (t < start + dur)
        env = np.exp(-3.0 * (t[seg] - start) / dur) * np.minimum(
            1.0, (t[seg] - start) * 20.0
        )
        vib = 1.0 + 0.003 * np.sin(2 * np.pi * rng.uniform(4, 7) * t[seg])
        note = np.zeros(seg.sum(), np.float64)
        for h in range(1, 6):
            if f0 * h * 1.01 >= sr / 2:
                break
            note += (0.6 ** (h - 1)) * np.sin(
                2 * np.pi * f0 * h * vib * (t[seg] - start)
                + rng.uniform(0, 2 * np.pi)
            )
        out[seg] += env * note * rng.uniform(0.2, 0.5)
    peak = np.abs(out).max()
    return (0.7 * out / max(peak, 1e-9)).astype(np.float32)


def band_noise(rng: np.random.Generator, seconds: float, sr: int,
               lo: float, hi: float) -> np.ndarray:
    """Band-limited noise via FFT masking (engine hum / crowd / hiss…)."""
    n = int(seconds * sr)
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    spec[(freqs < lo) | (freqs > hi)] = 0.0
    x = np.fft.irfft(spec, n=n)
    return (0.5 * x / max(np.abs(x).max(), 1e-9)).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./data_src")
    p.add_argument("--sr", type=int, default=8000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_train", type=int, default=60)
    p.add_argument("--n_test", type=int, default=8)
    args = p.parse_args(argv)
    rng = np.random.default_rng(args.seed)

    bands = [(40, 400), (200, 1200), (800, 3000), (30, 3800)]
    for split, n_clips, secs in [("train", args.n_train, 6.0),
                                 ("test", args.n_test, 3.0)]:
        cdir = os.path.join(args.root, "data", split, "clean")
        ndir = os.path.join(args.root, "data", split, "noise")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ndir, exist_ok=True)
        for i in range(n_clips):
            write_wav(os.path.join(cdir, f"clip_{i:03d}.wav"),
                      music_clip(rng, secs, args.sr), args.sr)
        for i, (lo, hi) in enumerate(bands):
            write_wav(os.path.join(ndir, f"noise_{i}.wav"),
                      band_noise(rng, 8.0, args.sr, lo, hi), args.sr)
        print(f"{split}: {n_clips} clean clips + {len(bands)} noise clips")


if __name__ == "__main__":
    main()
