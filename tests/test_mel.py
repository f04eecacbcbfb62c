"""Mel filterbank / mel spectrogram parity with torchaudio semantics.

torchaudio itself is not installed; the fbank is validated against an
independent direct construction in this file and against torch.stft for the
spectrogram stage.
"""

import jax.numpy as jnp
import numpy as np
import torch

from audiodenoiser_tpu.dsp.mel import mel_filterbank, mel_spectrogram


def _independent_fbank(n_freqs, f_min, f_max, n_mels, sr):
    """Direct triangular construction (separate from the library's
    vectorized slope formulation)."""

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr // 2, n_freqs)
    pts = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if lo < f <= c if c > lo else False:
                fb[k, m] = (f - lo) / (c - lo)
            elif c < f < hi if hi > c else False:
                fb[k, m] = (hi - f) / (hi - c)
            elif f == c and c > lo:
                fb[k, m] = 1.0
    return fb


class TestMelFilterbank:
    def test_reference_loss_config_shape_and_quirk(self):
        """loss.py:38-42 — n_mels=64 over 32 bins: degenerate filters kept."""
        fb = mel_filterbank(32, 0.0, 4000.0, 64, 8000)
        assert fb.shape == (32, 64)
        empty = int((fb.sum(axis=0) == 0).sum())
        assert empty > 10  # many filters see no frequency bin at all

    def test_matches_independent_construction(self):
        fb = mel_filterbank(32, 0.0, 4000.0, 64, 8000)
        ref = _independent_fbank(32, 0.0, 4000.0, 64, 8000)
        np.testing.assert_allclose(fb, ref, atol=1e-5)

    def test_sane_config_matches_independent(self):
        fb = mel_filterbank(257, 0.0, 4000.0, 40, 8000)
        ref = _independent_fbank(257, 0.0, 4000.0, 40, 8000)
        np.testing.assert_allclose(fb, ref, atol=1e-5)


class TestMelSpectrogram:
    def test_pipeline_matches_torch_manual(self, rng):
        """Cross-check stft(power=2) @ fbank against a torch-built pipeline
        with the same (reflect-padded, hann, center=True) configuration."""
        x = rng.standard_normal(64).astype(np.float32)
        ours = np.asarray(mel_spectrogram(jnp.asarray(x)))

        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=63,
            hop_length=16,
            window=torch.hann_window(63),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        power = spec.abs().numpy() ** 2
        fb = mel_filterbank(32, 0.0, 4000.0, 64, 8000)
        ref = fb.T @ power
        assert ours.shape == ref.shape == (64, 4)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_batched(self, rng):
        x = rng.standard_normal((5, 64)).astype(np.float32)
        out = np.asarray(mel_spectrogram(jnp.asarray(x)))
        assert out.shape == (5, 64, 4)
