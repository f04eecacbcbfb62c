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


def speech_clip(rng: np.random.Generator, seconds: float, sr: int) -> np.ndarray:
    """Formant-synthesized pseudo-speech: voiced glottal pulse trains run
    through vowel-like resonators, alternating with fricative bursts and
    pauses. No real speech leaves or enters this zero-egress box — but the
    spectro-temporal statistics (pitch contours, formant structure, syllabic
    rhythm, silences) are speech-shaped, adding the clean-signal variety the
    music generator lacks (docs/STATUS.md: the library size/variety is the
    measured quality ceiling)."""
    from scipy.signal import lfilter

    n = int(seconds * sr)
    out = np.zeros(n, np.float64)
    # vowel-ish (F1, F2, F3) targets in Hz
    vowels = [(730, 1090, 2440), (270, 2290, 3010), (300, 870, 2240),
              (660, 1720, 2410), (440, 1020, 2240)]
    t = 0
    while t < n:
        seg = min(int(rng.uniform(0.08, 0.35) * sr), n - t)
        kind = rng.random()
        if kind < 0.15:  # inter-word pause
            t += seg
            continue
        env = np.minimum(1.0, np.minimum(np.arange(seg), seg - np.arange(seg))
                         / (0.015 * sr + 1e-9))
        if kind < 0.30:  # unvoiced fricative: high-passed noise burst
            x = np.diff(rng.standard_normal(seg), prepend=0.0)
            out[t:t + seg] += 0.15 * env * x
            t += seg
            continue
        # voiced: glottal pulse train with a pitch glide
        f0 = rng.uniform(80, 250)
        glide = rng.uniform(-0.3, 0.3)
        inst_f = f0 * (1.0 + glide * np.arange(seg) / max(seg, 1))
        phase = 2 * np.pi * np.cumsum(inst_f) / sr
        # soft sawtooth glottal source (first few harmonics)
        src = sum(np.sin(k * phase) / k for k in range(1, 5))
        f1, f2, f3 = vowels[rng.integers(len(vowels))]
        x = src
        for fc, bw in ((f1, 60), (f2, 90), (f3, 120)):
            if fc >= sr / 2 * 0.95:
                continue
            r = np.exp(-np.pi * bw / sr)
            th = 2 * np.pi * fc / sr
            x = lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], x)
        peak = np.abs(x).max()
        out[t:t + seg] += rng.uniform(0.25, 0.5) * env * x / max(peak, 1e-9)
        t += seg
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
    p.add_argument("--speech_fraction", type=float, default=0.0,
                   help="fraction of clean clips synthesized as formant "
                   "pseudo-speech instead of harmonic 'music' (0 keeps the "
                   "original library bit-identical; 0.5 recommended for "
                   "clean-signal variety)")
    args = p.parse_args(argv)
    rng = np.random.default_rng(args.seed)

    bands = [(40, 400), (200, 1200), (800, 3000), (30, 3800)]
    for split, n_clips, secs in [("train", args.n_train, 6.0),
                                 ("test", args.n_test, 3.0)]:
        cdir = os.path.join(args.root, "data", split, "clean")
        ndir = os.path.join(args.root, "data", split, "noise")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ndir, exist_ok=True)
        n_speech = int(round(n_clips * args.speech_fraction))
        for i in range(n_clips):
            gen = speech_clip if i < n_speech else music_clip
            write_wav(os.path.join(cdir, f"clip_{i:03d}.wav"),
                      gen(rng, secs, args.sr), args.sr)
        for i, (lo, hi) in enumerate(bands):
            write_wav(os.path.join(ndir, f"noise_{i}.wav"),
                      band_noise(rng, 8.0, args.sr, lo, hi), args.sr)
        print(f"{split}: {n_clips} clean clips + {len(bands)} noise clips")


if __name__ == "__main__":
    main()
