"""Loss parity vs an independent torch implementation of loss.py."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from audiodenoiser_tpu.dsp.mel import mel_filterbank
from audiodenoiser_tpu.losses import combined_perceptual_loss


def _torch_multi_scale_stft(pred, target):
    """Independent torch port of MultiScaleSTFTLoss (loss.py:6-35).

    pred/target: torch (B, 1, F, T) like the reference receives."""
    pred = pred.mean(dim=2).squeeze(1)
    target = target.mean(dim=2).squeeze(1)
    loss = 0.0
    for fft, hop in zip([63, 32, 16], [16, 8, 4]):
        window = torch.ones(fft)
        pm = torch.abs(
            torch.stft(pred, n_fft=fft, hop_length=hop, return_complex=True,
                       pad_mode="constant", window=window)
        )
        tm = torch.abs(
            torch.stft(target, n_fft=fft, hop_length=hop, return_complex=True,
                       pad_mode="constant", window=window)
        )
        loss += F.l1_loss(pm, tm)
    return loss / 3


def _torch_mel(pred, target):
    """torchaudio.MelSpectrogram(8000, n_fft=63, hop=16, n_mels=64) rebuilt
    from torch.stft (hann, center/reflect, power=2) + the validated fbank."""
    pred = pred.mean(dim=2).squeeze(1)
    target = target.mean(dim=2).squeeze(1)
    fb = torch.from_numpy(mel_filterbank(32, 0.0, 4000.0, 64, 8000))

    def mel(x):
        spec = torch.stft(
            x, n_fft=63, hop_length=16, window=torch.hann_window(63),
            center=True, pad_mode="reflect", return_complex=True,
        )
        return torch.einsum("bft,fm->bmt", spec.abs() ** 2, fb)

    return F.l1_loss(mel(pred), mel(target))


def _torch_combined(pred, target):
    s = _torch_multi_scale_stft(pred, target)
    m = _torch_mel(pred, target)
    l1 = F.l1_loss(pred, target)
    return 0.4 * s + 0.4 * m + 0.2 * l1, s, m, l1


def _make_pair(rng, shape=(4, 256, 64)):
    pred = np.abs(rng.standard_normal(shape)).astype(np.float32)
    target = np.abs(rng.standard_normal(shape)).astype(np.float32)
    return pred, target


class TestCombinedLoss:
    def test_matches_torch_reference_port(self, rng):
        pred, target = _make_pair(rng)
        ours = combined_perceptual_loss(
            jnp.asarray(pred)[..., None], jnp.asarray(target)[..., None]
        )
        ref = _torch_combined(
            torch.from_numpy(pred).unsqueeze(1), torch.from_numpy(target).unsqueeze(1)
        )
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(float(a), float(b), rtol=2e-4)

    def test_eval_shape_257(self, rng):
        """test.py:118-122 applies the loss to (N, 257, T) eval arrays."""
        pred, target = _make_pair(rng, (3, 257, 188))
        ours = combined_perceptual_loss(
            jnp.asarray(pred)[..., None], jnp.asarray(target)[..., None]
        )
        ref = _torch_combined(
            torch.from_numpy(pred).unsqueeze(1), torch.from_numpy(target).unsqueeze(1)
        )
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(float(a), float(b), rtol=2e-4)

    def test_weights_and_tuple_order(self, rng):
        pred, target = _make_pair(rng, (2, 64, 64))
        total, s, m, l1 = combined_perceptual_loss(
            jnp.asarray(pred), jnp.asarray(target)
        )
        np.testing.assert_allclose(
            float(total), 0.4 * float(s) + 0.4 * float(m) + 0.2 * float(l1), rtol=1e-6
        )

    def test_zero_for_identical_inputs(self, rng):
        pred, _ = _make_pair(rng, (2, 64, 64))
        total, s, m, l1 = combined_perceptual_loss(
            jnp.asarray(pred), jnp.asarray(pred)
        )
        assert float(total) == 0.0

    def test_jittable(self, rng):
        import jax

        pred, target = _make_pair(rng, (2, 64, 64))
        f = jax.jit(lambda a, b: combined_perceptual_loss(a, b).total)
        eager = combined_perceptual_loss(jnp.asarray(pred), jnp.asarray(target)).total
        np.testing.assert_allclose(
            float(f(jnp.asarray(pred), jnp.asarray(target))), float(eager), rtol=1e-5
        )

    def test_grad_flows(self, rng):
        import jax

        pred, target = _make_pair(rng, (2, 64, 64))
        g = jax.grad(lambda a: combined_perceptual_loss(a, jnp.asarray(target)).total)(
            jnp.asarray(pred)
        )
        assert np.abs(np.asarray(g)).max() > 0
