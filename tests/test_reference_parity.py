"""Head-to-head eval parity vs the PyTorch reference (BASELINE.md gate).

Discharges the "SI-SDR within 0.1 dB of the PyTorch reference" criterion:
the SAME weights evaluate the SAME noisy spectrograms through (a) the
reference pipeline — ``/root/reference/code/test.py:100-138`` imported as a
black-box oracle (torch forward + ``loss.CombinedPerceptualLoss``) — and
(b) this framework's eval surface, then both reconstructions are scored
with the same SI-SDR metric against the true clean waveform.

librosa (the reference's GL backend, ``test.py:29-48``) is not installed in
this environment, so both sides share this framework's ``mode='reference'``
Griffin-Lim with an identical random-phase seed — the shared operator
isolates exactly the framework delta the gate is about (model forward,
loss, DSP plumbing), not GL sampling noise.

Measured numbers are recorded in BASELINE.md ("Quality gate: measured").
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import audiodenoiser_tpu.dsp.stft as stft_lib
from audiodenoiser_tpu.dsp.griffin_lim import griffin_lim
from audiodenoiser_tpu.eval.metrics import si_sdr
from audiodenoiser_tpu.eval.runner import (
    DenoiserRunner,
    test_single_noise_type as eval_single_noise_type,  # alias: not a pytest test
)
from audiodenoiser_tpu.losses import combined_perceptual_loss
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train.torch_import import convert_state_dict

REF_CODE = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_CODE, "model.py")),
    reason="reference checkout unavailable",
)

SR, N_FFT, HOP = 8000, 512, 128
N_FRAMES = 64
N_SAMPLES = (N_FRAMES - 1) * HOP  # center=True: samples/hop + 1 frames


def _make_eval_set(n=4):
    """Clean waveforms (sine mixtures) + white noise -> magnitude npy pairs,
    exactly the builders' featurization (|STFT|, center=True)."""
    rng = np.random.default_rng(0)
    t = np.arange(N_SAMPLES) / SR
    clean_wav = np.stack(
        [
            sum(
                a * np.sin(2 * np.pi * f * t)
                for a, f in zip(rng.uniform(0.2, 0.5, 3), rng.uniform(100, 2000, 3))
            )
            for _ in range(n)
        ]
    ).astype(np.float32)
    noisy_wav = clean_wav + 0.1 * rng.standard_normal(clean_wav.shape).astype(
        np.float32
    )
    to_mag = lambda w: np.asarray(
        jnp.abs(stft_lib.stft(jnp.asarray(w), N_FFT, HOP, center=True))
    ).astype(np.float32)
    return clean_wav, to_mag(clean_wav), to_mag(noisy_wav)


@pytest.fixture(scope="module")
def eval_set():
    return _make_eval_set()


def _install_torchaudio_shim():
    """torchaudio is not installed; provide MelSpectrogram with torchaudio's
    documented semantics (HTK mel fbank, norm=None, periodic Hann, center=True
    reflect pad, power=2) in PURE TORCH so loss.py:4,38-42 imports. The shim
    shares no code with the JAX implementation under test."""
    if "torchaudio" in sys.modules:
        return
    import types

    class MelSpectrogram(torch.nn.Module):
        def __init__(self, sample_rate=16000, n_fft=400, hop_length=None,
                     n_mels=128):
            super().__init__()
            self.n_fft = n_fft
            self.hop_length = hop_length or n_fft // 2
            n_freqs = n_fft // 2 + 1
            hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
            mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
            freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
            pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sample_rate / 2.0),
                                     n_mels + 2))
            diff = pts[1:] - pts[:-1]
            slopes = pts[None, :] - freqs[:, None]
            fb = np.maximum(0.0, np.minimum(-slopes[:, :-2] / diff[:-1],
                                            slopes[:, 2:] / diff[1:]))
            self.register_buffer("fb", torch.from_numpy(fb.astype(np.float32)))
            self.register_buffer(
                "window", torch.hann_window(n_fft, periodic=True)
            )

        def forward(self, x):
            spec = torch.stft(
                x, self.n_fft, self.hop_length, win_length=self.n_fft,
                window=self.window, center=True, pad_mode="reflect",
                return_complex=True,
            )
            return torch.matmul(
                spec.abs().pow(2.0).transpose(-1, -2), self.fb
            ).transpose(-1, -2)

    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")
    tr.MelSpectrogram = MelSpectrogram
    ta.transforms = tr
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tr


@pytest.fixture(scope="module")
def ref_loss_cls():
    _install_torchaudio_shim()
    sys.path.insert(0, REF_CODE)
    from loss import CombinedPerceptualLoss  # noqa: the reference oracle

    return CombinedPerceptualLoss


@pytest.fixture(scope="module")
def torch_model(eval_set):
    """Reference U-Net, briefly fit on the eval pairs so outputs are
    realistic positive magnitudes (makes the GL comparison meaningful and
    the non-negativity clip a no-op, as for any trained checkpoint)."""
    sys.path.insert(0, REF_CODE)
    from model import UNet as TorchUNet  # noqa: the reference oracle

    _, clean_mag, noisy_mag = eval_set
    torch.manual_seed(0)
    m = TorchUNet(in_channels=1, num_classes=1)
    opt = torch.optim.Adam(m.parameters(), lr=2e-3)
    x = torch.from_numpy(noisy_mag).unsqueeze(1)
    y = torch.from_numpy(clean_mag).unsqueeze(1)
    m.train()
    for _ in range(8):
        opt.zero_grad()
        loss = ((m(x) - y) ** 2).mean()
        loss.backward()
        opt.step()
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_side(torch_model):
    payload = convert_state_dict(torch_model.state_dict())
    variables = {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }
    return UNet(), variables  # f32 compute for the exact head-to-head


class TestHeadToHead:
    def test_si_sdr_and_losses_match_reference_pipeline(
        self, eval_set, torch_model, flax_side, ref_loss_cls
    ):
        clean_wav, clean_mag, noisy_mag = eval_set

        # --- reference eval path (test.py:112-123 oracle) ---
        with torch.no_grad():
            den_ref = (
                torch_model(torch.from_numpy(noisy_mag).unsqueeze(1))
                .squeeze(1)
                .numpy()
            )
            tot_r, stft_r, mel_r, l1_r = ref_loss_cls()(
                torch.from_numpy(den_ref).unsqueeze(1),
                torch.from_numpy(clean_mag).unsqueeze(1),
            )

        # --- this framework, identical weights + inputs ---
        model, variables = flax_side
        runner = DenoiserRunner(model, variables, n_fft=N_FFT, hop_length=HOP)
        den_j = np.asarray(runner.denoise_spectrogram(jnp.asarray(noisy_mag)))
        np.testing.assert_allclose(den_j, den_ref, atol=2e-4)

        tot_j, stft_j, mel_j, l1_j = combined_perceptual_loss(
            jnp.asarray(den_j)[..., None], jnp.asarray(clean_mag)[..., None]
        )
        for ours, ref, name in [
            (tot_j, tot_r, "total"),
            (stft_j, stft_r, "stft"),
            (mel_j, mel_r, "mel"),
            (l1_j, l1_r, "l1"),
        ]:
            assert abs(float(ours) - float(ref)) < 2e-4, (
                name, float(ours), float(ref),
            )

        # --- GL reconstruction (shared operator + phase seed) -> SI-SDR ---
        key = jax.random.key(0)

        def recon_sdr(den):
            audio = griffin_lim(
                jnp.asarray(np.maximum(den, 0.0)), key, n_fft=N_FFT,
                hop_length=HOP, n_iter=50, mode="reference", length=N_SAMPLES,
            )
            return float(jnp.mean(si_sdr(audio, jnp.asarray(clean_wav))))

        sdr_ref = recon_sdr(den_ref)
        sdr_ours = recon_sdr(den_j)
        print(
            f"\nhead-to-head SI-SDR: reference={sdr_ref:.4f} dB, "
            f"ours={sdr_ours:.4f} dB, |delta|={abs(sdr_ours - sdr_ref):.5f} dB"
        )
        assert abs(sdr_ours - sdr_ref) <= 0.1, (sdr_ours, sdr_ref)

    def test_eval_driver_metrics_txt_matches_reference_losses(
        self, eval_set, torch_model, flax_side, ref_loss_cls, tmp_path
    ):
        """The user-facing eval driver's {nt}_metrics.txt numbers must equal
        the reference criterion's on identical npy inputs (test.py:124-138)."""
        clean_wav, clean_mag, noisy_mag = eval_set
        np.save(tmp_path / "clean_white.npy", clean_mag)
        np.save(tmp_path / "noisy_white.npy", noisy_mag)

        model, variables = flax_side
        out_dir = tmp_path / "out"
        metrics = eval_single_noise_type(
            model, variables, "white", str(tmp_path), str(out_dir),
            num_audio_examples=1, seed=0,
        )

        with torch.no_grad():
            den_ref = (
                torch_model(torch.from_numpy(noisy_mag).unsqueeze(1))
                .squeeze(1)
                .numpy()
            )
            tot_r, stft_r, mel_r, l1_r = ref_loss_cls()(
                torch.from_numpy(den_ref).unsqueeze(1),
                torch.from_numpy(clean_mag).unsqueeze(1),
            )
        assert abs(metrics["total"] - float(tot_r)) < 2e-4
        assert abs(metrics["stft"] - float(stft_r)) < 2e-4
        assert abs(metrics["mel"] - float(mel_r)) < 2e-4
        assert abs(metrics["l1"] - float(l1_r)) < 2e-4
        # reference-identical artifact names came out of the driver
        assert (out_dir / "white_metrics.txt").exists()
        assert (out_dir / "white_denoised_0.wav").exists()
