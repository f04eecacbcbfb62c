"""STFT/iSTFT parity tests: JAX implementation vs NumPy golden + torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import audiodenoiser_tpu.dsp.stft as S
from audiodenoiser_tpu.dsp.window import hann_window
from tests import golden


def _sig(rng, n=16000):
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


class TestWindow:
    def test_hann_periodic_matches_torch(self):
        for n in (16, 63, 512):
            ours = hann_window(n)
            ref = torch.hann_window(n, periodic=True).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestFraming:
    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (512, 100), (63, 16)])
    def test_frames_match_manual_slices(self, rng, n_fft, hop):
        x = _sig(rng, 4000)
        frames = np.asarray(S.frame_signal(jnp.asarray(x), n_fft, hop))
        t = 1 + (len(x) - n_fft) // hop
        assert frames.shape == (t, n_fft)
        for i in range(t):
            np.testing.assert_array_equal(frames[i], x[i * hop : i * hop + n_fft])

    def test_batched_framing(self, rng):
        x = rng.standard_normal((3, 2, 2000)).astype(np.float32)
        frames = np.asarray(S.frame_signal(jnp.asarray(x), 512, 128))
        assert frames.shape == (3, 2, 1 + (2000 - 512) // 128, 512)
        np.testing.assert_array_equal(frames[1, 0, 3], x[1, 0, 3 * 128 : 3 * 128 + 512])


class TestSTFT:
    def test_train_path_center_false(self, rng):
        """create_train_dataset.py:167-172 — n_fft=512, hop=128, center=False."""
        x = _sig(rng)
        ours = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=False))
        ref = golden.np_stft(x.astype(np.float64), 512, 128, center=False)
        assert ours.shape == (257, 122)  # SURVEY.md §1 breakage note 3
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_test_path_center_true(self, rng):
        """create_test_dataset.py:35-41 — center=True (librosa default)."""
        x = _sig(rng, 24000)
        ours = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=True))
        ref = golden.np_stft(x.astype(np.float64), 512, 128, center=True)
        assert ours.shape == (257, 1 + 24000 // 128)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_against_torch_stft(self, rng):
        x = _sig(rng, 8000)
        ours = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=True))
        ref = torch.stft(
            torch.from_numpy(x),
            n_fft=512,
            hop_length=128,
            window=torch.hann_window(512),
            center=True,
            pad_mode="constant",
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_rect_window_constant_pad_matches_torch(self, rng):
        """The multi-scale-loss configuration (loss.py:25-33)."""
        x = _sig(rng, 64)
        for n_fft, hop in [(63, 16), (32, 8), (16, 4)]:
            ours = np.asarray(
                S.stft(jnp.asarray(x), n_fft, hop, window="ones", center=True)
            )
            ref = torch.stft(
                torch.from_numpy(x),
                n_fft=n_fft,
                hop_length=hop,
                window=torch.ones(n_fft),
                pad_mode="constant",
                return_complex=True,
            ).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_matmul_path_matches_fft_path(self, rng):
        x = rng.standard_normal((4, 16000)).astype(np.float32)
        a = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=False))
        b = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=False, precision="matmul"))
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_jit_and_batch(self, rng):
        x = rng.standard_normal((8, 16000)).astype(np.float32)
        f = jax.jit(lambda v: S.stft(v, 512, 128, center=False))
        out = np.asarray(f(jnp.asarray(x)))
        assert out.shape == (8, 257, 122)
        single = np.asarray(S.stft(jnp.asarray(x[3]), 512, 128, center=False))
        np.testing.assert_allclose(out[3], single, atol=1e-5)


class TestISTFT:
    def test_roundtrip_center_true(self, rng):
        x = _sig(rng, 8000)
        spec = S.stft(jnp.asarray(x), 512, 128, center=True)
        y = np.asarray(S.istft(spec, hop_length=128, center=True))
        assert y.shape == (128 * (spec.shape[-1] - 1),)
        np.testing.assert_allclose(y, x[: y.shape[0]], atol=1e-4)

    def test_matches_numpy_golden(self, rng):
        x = _sig(rng, 8000)
        spec = golden.np_stft(x.astype(np.float64), 512, 128, center=True)
        ours = np.asarray(S.istft(jnp.asarray(spec.astype(np.complex64)), 128))
        ref = golden.np_istft(spec, 128, center=True)
        np.testing.assert_allclose(ours, ref[: len(ours)], atol=1e-4)

    def test_matches_torch_istft(self, rng):
        x = _sig(rng, 8000)
        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=512,
            hop_length=128,
            window=torch.hann_window(512),
            center=True,
            pad_mode="constant",
            return_complex=True,
        )
        ref = torch.istft(
            spec, n_fft=512, hop_length=128, window=torch.hann_window(512)
        ).numpy()
        ours = np.asarray(
            S.istft(jnp.asarray(spec.numpy()), hop_length=128, length=len(ref))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_overlap_add_scatter_free_vs_scatter(self, rng):
        frames = rng.standard_normal((5, 10, 512)).astype(np.float32)
        fast = np.asarray(S.overlap_add(jnp.asarray(frames), 128))  # 512 % 128 == 0
        slow = np.asarray(S.overlap_add(jnp.asarray(frames), 100))
        assert fast.shape == (5, 9 * 128 + 512)
        assert slow.shape == (5, 9 * 100 + 512)
        # cross-check the fast path against a manual OLA
        manual = np.zeros((5, 9 * 128 + 512), np.float32)
        for t in range(10):
            manual[:, t * 128 : t * 128 + 512] += frames[:, t]
        np.testing.assert_allclose(fast, manual, atol=1e-5)

    def test_length_pad_and_trim(self, rng):
        x = _sig(rng, 4000)
        spec = S.stft(jnp.asarray(x), 512, 128)
        assert S.istft(spec, 128, length=4000).shape == (4000,)
        assert S.istft(spec, 128, length=5000).shape == (5000,)
        assert S.istft(spec, 128, length=100).shape == (100,)


class TestMagphase:
    def test_magphase(self, rng):
        x = _sig(rng, 4000)
        spec = S.stft(jnp.asarray(x), 512, 128)
        mag, phase = S.magphase(spec)
        np.testing.assert_allclose(np.asarray(mag), np.abs(np.asarray(spec)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mag * phase), np.asarray(spec), atol=1e-5
        )
        np.testing.assert_allclose(np.abs(np.asarray(phase)), 1.0, atol=1e-5)


class TestReviewRegressions:
    def test_num_frames_odd_nfft_center(self, rng):
        """num_frames must agree with the actual stft output for odd n_fft
        (the 63-FFT mel-loss config pads one sample less per side)."""
        import audiodenoiser_tpu.dsp.stft as S2

        for length, n_fft, hop in [(64, 63, 16), (64, 32, 8), (100, 63, 16),
                                   (16000, 512, 128)]:
            got = S2.stft(jnp.zeros(length), n_fft, hop, center=True).shape[-1]
            assert S2.num_frames(length, n_fft, hop, center=True) == got

    def test_magphase_zero_bins_have_unit_phase(self):
        """librosa.magphase gives phase 1 (not 0) for zero bins."""
        spec = jnp.zeros((5, 4), jnp.complex64)
        mag, phase = S.magphase(spec)
        np.testing.assert_array_equal(np.asarray(phase), 1.0 + 0.0j)
