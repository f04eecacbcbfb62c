"""Griffin-Lim reconstruction quality and reference-mode behavior."""

import jax
import jax.numpy as jnp
import numpy as np

import audiodenoiser_tpu.dsp.stft as S
from audiodenoiser_tpu.dsp.griffin_lim import griffin_lim


def _tone(n=8000, sr=8000):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )


def _spectral_convergence(mag_ref, audio, n_fft=512, hop=128):
    rec = np.abs(np.asarray(S.stft(jnp.asarray(audio), n_fft, hop, center=True)))
    m = min(rec.shape[-1], mag_ref.shape[-1])
    num = np.linalg.norm(rec[..., :m] - mag_ref[..., :m])
    return num / np.linalg.norm(mag_ref[..., :m])


class TestGriffinLim:
    def test_correct_mode_converges(self):
        x = _tone()
        mag = jnp.abs(S.stft(jnp.asarray(x), 512, 128, center=True))
        y = np.asarray(
            griffin_lim(mag, jax.random.key(0), hop_length=128, n_iter=50)
        )
        assert _spectral_convergence(np.asarray(mag), y) < 0.15

    def test_momentum_accelerates(self):
        x = _tone()
        mag = jnp.abs(S.stft(jnp.asarray(x), 512, 128, center=True))
        plain = np.asarray(
            griffin_lim(mag, jax.random.key(1), hop_length=128, n_iter=15)
        )
        fast = np.asarray(
            griffin_lim(mag, jax.random.key(1), hop_length=128, n_iter=15, momentum=0.99)
        )
        assert _spectral_convergence(np.asarray(mag), fast) <= _spectral_convergence(
            np.asarray(mag), plain
        )

    def test_reference_mode_runs_and_diverges_from_magnitude(self):
        """test.py:39-46 never re-imposes the magnitude; after iter 1 the
        estimate is an istft/stft fixed point of the random-phase seed."""
        x = _tone()
        mag = jnp.abs(S.stft(jnp.asarray(x), 512, 128, center=True))
        y = np.asarray(
            griffin_lim(mag, jax.random.key(0), hop_length=128, n_iter=50, mode="reference")
        )
        assert y.shape == (128 * (mag.shape[-1] - 1),)
        assert np.all(np.isfinite(y))
        # the reference loop should NOT converge to the target magnitude
        assert _spectral_convergence(np.asarray(mag), y) > 0.05

    def test_batched(self):
        x = np.stack([_tone(), _tone() * 0.5])
        mag = jnp.abs(S.stft(jnp.asarray(x), 512, 128, center=True))
        y = np.asarray(griffin_lim(mag, jax.random.key(0), hop_length=128, n_iter=5))
        assert y.shape == (2, 128 * (mag.shape[-1] - 1))

    def test_length_arg(self):
        x = _tone()
        mag = jnp.abs(S.stft(jnp.asarray(x), 512, 128, center=True))
        y = griffin_lim(mag, jax.random.key(0), hop_length=128, n_iter=2, length=8000)
        assert y.shape == (8000,)
