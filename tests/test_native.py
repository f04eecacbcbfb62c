"""Native C++ ingest: decode/resample parity with the scipy path."""

import numpy as np
import pytest

from audiodenoiser_tpu.data import native
from audiodenoiser_tpu.data.wav_io import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestNativeDecode:
    def test_decode_16bit_matches_python(self, tmp_path, rng):
        x = np.clip(rng.standard_normal(8000) * 0.3, -1, 1).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x, 8000)
        ours = native.load_wav(p)
        ref, _ = read_wav(p)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_decode_float32_wav(self, tmp_path, rng):
        from scipy.io import wavfile

        x = np.clip(rng.standard_normal(4000) * 0.3, -1, 1).astype(np.float32)
        p = str(tmp_path / "f.wav")
        wavfile.write(p, 8000, x)
        np.testing.assert_allclose(native.load_wav(p), x, atol=1e-7)

    def test_stereo_downmix(self, tmp_path):
        from scipy.io import wavfile

        stereo = np.stack([np.ones(64, np.float32), np.zeros(64, np.float32)], 1)
        p = str(tmp_path / "s.wav")
        wavfile.write(p, 8000, stereo)
        np.testing.assert_allclose(native.load_wav(p), 0.5, atol=1e-6)

    def test_resample_matches_scipy(self, tmp_path):
        from scipy.io import wavfile

        t = np.arange(44100) / 44100
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "r.wav")
        wavfile.write(p, 44100, x)
        ours = native.load_wav(p, sample_rate=8000)
        ref, _ = read_wav(p, sample_rate=8000)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(IOError):
            native.load_wav(str(tmp_path / "nope.wav"))


class TestNativeBatch:
    def test_batch_chunks_match_python_pipeline(self, tmp_path, rng):
        from audiodenoiser_tpu.data.builders import _load_clean_chunks

        paths = []
        for i, n in enumerate((40000, 20000, 9000)):
            x = np.clip(rng.standard_normal(n) * 0.3, -1, 1).astype(np.float32)
            p = str(tmp_path / f"{i}.wav")
            write_wav(p, x, 8000)
            paths.append(p)
        ours = native.load_batch(paths, 8000, 16000)
        ref = _load_clean_chunks(paths, 8000, 16000)
        assert ours.shape == ref.shape == (3, 16000)  # 2 + 1 + 0 chunks
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_empty_batch(self):
        out = native.load_batch([], 8000, 16000)
        assert out.shape == (0, 16000)
