"""Dataset builder + CLI artifact parity (names, shapes, dtypes)."""

import os

import numpy as np
import pytest

from audiodenoiser_tpu.data.builders import build_test_dataset, build_train_dataset
from audiodenoiser_tpu.data.wav_io import write_wav

NOISE_TYPES = ["white", "urban", "reverb", "noise_cancellation"]


@pytest.fixture
def wav_dirs(tmp_path):
    rng = np.random.default_rng(0)
    clean_dir, noise_dir = tmp_path / "clean", tmp_path / "noise"
    clean_dir.mkdir(), noise_dir.mkdir()
    # two clean files: 5 s (-> 2 chunks) and 2.5 s (-> 1 chunk) at 8 kHz
    write_wav(str(clean_dir / "a.wav"), np.clip(rng.standard_normal(40000) * 0.2, -1, 1), 8000)
    write_wav(str(clean_dir / "b.wav"), np.clip(rng.standard_normal(20000) * 0.2, -1, 1), 8000)
    write_wav(str(noise_dir / "n.wav"), np.clip(rng.standard_normal(30000) * 0.3, -1, 1), 8000)
    return str(clean_dir), str(noise_dir)


class TestTrainBuilder:
    def test_artifact_names_shapes_dtypes(self, wav_dirs, tmp_path):
        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "train_processed")
        dbg = str(tmp_path / "debug")
        n = build_train_dataset(clean_dir, noise_dir, out, debug_dir=dbg)
        assert n == 3  # 2 + 1 chunks
        for nt in NOISE_TYPES:
            sub = os.path.join(out, nt)
            files = sorted(os.listdir(sub))
            assert len(files) == 6  # 3 chunks x (clean + noisy)
            for i in range(3):
                for kind in ("clean", "noisy"):
                    p = os.path.join(sub, f"{kind}_{nt}_chunk_{i}.npy")
                    assert os.path.exists(p), p
                    arr = np.load(p)
                    # (257, 122): n_fft=512, hop=128, center=False on 16000
                    assert arr.shape == (257, 122)
                    assert arr.dtype == np.float32
                    assert np.all(arr >= 0)
            # <=2 debug wavs per type
            dbg_files = [f for f in os.listdir(dbg) if f.startswith(f"debug_{nt}_")]
            assert len(dbg_files) == 2

    def test_noisy_differs_from_clean(self, wav_dirs, tmp_path):
        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "tp")
        build_train_dataset(clean_dir, noise_dir, out, noise_types=("white",))
        c = np.load(os.path.join(out, "white", "clean_white_chunk_0.npy"))
        x = np.load(os.path.join(out, "white", "noisy_white_chunk_0.npy"))
        assert not np.allclose(c, x)

    def test_empty_clean_dir(self, tmp_path):
        (tmp_path / "empty").mkdir()
        (tmp_path / "noise").mkdir()
        n = build_train_dataset(
            str(tmp_path / "empty"), str(tmp_path / "noise"), str(tmp_path / "o")
        )
        assert n == 0


class TestTestBuilder:
    def test_stacked_artifacts(self, wav_dirs, tmp_path):
        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "test_processed")
        res = build_test_dataset(clean_dir, noise_dir, out)
        for nt in NOISE_TYPES:
            clean = np.load(os.path.join(out, f"clean_{nt}.npy"))
            noisy = np.load(os.path.join(out, f"noisy_{nt}.npy"))
            # 2 clips truncated to the shorter (20000); center=True
            assert clean.shape == noisy.shape == (2, 257, 1 + 20000 // 128)
            assert clean.dtype == noisy.dtype == np.float32
            np.testing.assert_allclose(clean, res[nt][0])

    def test_audio_artifacts_saved_and_consistent(self, wav_dirs, tmp_path):
        """save_audio (default) writes the waveform stacks, and the saved
        noisy magnitudes are exactly the STFT magnitudes of the saved
        noisy waveforms (the property the eval's true-SI-SDR path needs)."""
        import jax.numpy as jnp

        import audiodenoiser_tpu.dsp.stft as S

        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "tp_audio")
        build_test_dataset(clean_dir, noise_dir, out, noise_types=("white",))
        clean_audio = np.load(os.path.join(out, "clean_audio.npy"))
        noisy_audio = np.load(os.path.join(out, "noisy_audio_white.npy"))
        noisy_mag = np.load(os.path.join(out, "noisy_white.npy"))
        assert clean_audio.shape == noisy_audio.shape == (2, 20000)
        ref = np.abs(
            np.asarray(S.stft(jnp.asarray(noisy_audio), 512, 128, center=True))
        )
        np.testing.assert_allclose(noisy_mag, ref, atol=1e-5)

    def test_no_audio_artifacts_flag(self, wav_dirs, tmp_path):
        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "tp_noaudio")
        build_test_dataset(
            clean_dir, noise_dir, out, noise_types=("white",), save_audio=False
        )
        assert not os.path.exists(os.path.join(out, "clean_audio.npy"))
        assert not os.path.exists(os.path.join(out, "noisy_audio_white.npy"))

    def test_clean_magnitudes_match_direct_stft(self, wav_dirs, tmp_path):
        import jax.numpy as jnp

        import audiodenoiser_tpu.dsp.stft as S
        from audiodenoiser_tpu.data.wav_io import read_wav

        clean_dir, noise_dir = wav_dirs
        out = str(tmp_path / "tp2")
        build_test_dataset(clean_dir, noise_dir, out, noise_types=("white",))
        clean = np.load(os.path.join(out, "clean_white.npy"))
        y, _ = read_wav(os.path.join(clean_dir, "a.wav"), sample_rate=8000)
        ref = np.abs(np.asarray(S.stft(jnp.asarray(y[:20000]), 512, 128, center=True)))
        np.testing.assert_allclose(clean[0], ref, atol=1e-5)


class TestCLIs:
    def test_create_train_dataset_cli(self, wav_dirs, tmp_path, capsys):
        from audiodenoiser_tpu.cli.create_train_dataset import main

        clean_dir, noise_dir = wav_dirs
        main(
            [
                "--clean_dir", clean_dir,
                "--noise_dir", noise_dir,
                "--output_base", str(tmp_path / "out"),
                "--debug_dir", str(tmp_path / "dbg"),
                "--noise_types", "white",
            ]
        )
        assert "Done!" in capsys.readouterr().out
        assert os.path.exists(tmp_path / "out" / "white" / "clean_white_chunk_0.npy")

    def test_create_test_dataset_cli(self, wav_dirs, tmp_path, capsys):
        from audiodenoiser_tpu.cli.create_test_dataset import main

        clean_dir, noise_dir = wav_dirs
        main(
            [
                "--clean_dir", clean_dir,
                "--noise_dir", noise_dir,
                "--output_dir", str(tmp_path / "out"),
                "--noise_types", "urban",
            ]
        )
        assert "complete" in capsys.readouterr().out
        assert os.path.exists(tmp_path / "out" / "noisy_urban.npy")
