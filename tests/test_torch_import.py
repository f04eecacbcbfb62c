"""Torch .pth import: numerical equivalence against the reference model.

Uses the reference implementation at /root/reference/code/model.py as a
black-box ORACLE (imported read-only at test time, never copied): a randomly
initialized torch U-Net's state_dict is converted and the Flax forward must
reproduce the torch forward to float tolerance in eval mode.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiodenoiser_tpu.models import UNet, count_params
from audiodenoiser_tpu.train.torch_import import convert_state_dict, load_pth

REF_CODE = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_CODE, "model.py")),
    reason="reference checkout unavailable",
)


@pytest.fixture(scope="module")
def torch_model():
    sys.path.insert(0, REF_CODE)
    from model import UNet as TorchUNet  # noqa: the reference oracle

    torch.manual_seed(0)
    m = TorchUNet(in_channels=1, num_classes=1)
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(torch_model):
    return convert_state_dict(torch_model.state_dict())


class TestConversion:
    def test_param_count_preserved(self, converted):
        assert count_params(converted["params"]) == 31_042_369

    def test_tree_matches_flax_init(self, converted):
        import jax

        model = UNet()
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 32, 32, 1)))
        )(jax.random.key(0))
        ours = jax.tree_util.tree_structure(jax.device_get(variables["params"]))
        theirs = jax.tree_util.tree_structure(converted["params"])
        assert ours == theirs
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(variables["params"]))[0],
            jax.tree_util.tree_flatten_with_path(converted["params"])[0],
        ):
            assert np.shape(a) == np.shape(b), (pa, np.shape(a), np.shape(b))

    @pytest.mark.parametrize("shape", [(1, 64, 64), (2, 257, 60)])
    def test_forward_matches_torch_oracle(self, torch_model, converted, shape):
        rng = np.random.default_rng(0)
        x = np.abs(rng.standard_normal(shape)).astype(np.float32)
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(x).unsqueeze(1)).squeeze(1).numpy()
        model = UNet()  # f32 compute for exact comparison
        ours = np.asarray(
            model.apply(
                {"params": converted["params"], "batch_stats": converted["batch_stats"]},
                jnp.asarray(x)[..., None],
                train=False,
            )
        )[..., 0]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_load_pth_roundtrip(self, torch_model, tmp_path):
        p = str(tmp_path / "unet_denoiser_white.pth")
        torch.save(torch_model.state_dict(), p)
        payload = load_pth(p)
        assert count_params(payload["params"]) == 31_042_369


class TestPthDropIn:
    def test_eval_loads_pth_directly(self, torch_model, tmp_path):
        from audiodenoiser_tpu.eval.runner import load_model_for_noise
        from audiodenoiser_tpu.models import UNet

        p = str(tmp_path / "unet_denoiser_reverb.pth")
        torch.save(torch_model.state_dict(), p)
        model, variables = load_model_for_noise(
            "reverb", str(tmp_path), model=UNet()
        )
        out = model.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 64, 64, 1)

    def test_import_checkpoint_cli(self, torch_model, tmp_path, capsys):
        from audiodenoiser_tpu.cli.import_checkpoint import main

        p = str(tmp_path / "unet_denoiser_urban.pth")
        torch.save(torch_model.state_dict(), p)
        main(["--saved_models_dir", str(tmp_path)])
        assert "converted" in capsys.readouterr().out
        assert os.path.exists(str(tmp_path / "unet_denoiser_urban.ckpt"))


class TestQualityParity:
    def test_si_sdr_within_tenth_db_of_torch_reference(self, torch_model, converted, rng):
        """BASELINE.md quality gate: denoising the same noisy spectrograms
        with the same weights, the JAX path's SI-SDR (magnitude-only
        reconstruction) must sit within 0.1 dB of the torch reference's."""
        import audiodenoiser_tpu.dsp.stft as S
        from audiodenoiser_tpu.eval.metrics import si_sdr

        clean = np.abs(rng.standard_normal((2, 257, 60))).astype(np.float32)
        noisy = (clean + 0.3 * np.abs(rng.standard_normal((2, 257, 60)))).astype(
            np.float32
        )
        with torch.no_grad():
            den_t = torch_model(torch.from_numpy(noisy).unsqueeze(1)).squeeze(1).numpy()
        model = UNet()
        den_j = np.asarray(
            model.apply(
                {"params": converted["params"], "batch_stats": converted["batch_stats"]},
                jnp.asarray(noisy)[..., None],
                train=False,
            )
        )[..., 0]

        def recon_sisdr(den):
            audio = S.istft(jnp.asarray(den).astype(jnp.complex64), 128, center=True)
            ref_audio = S.istft(jnp.asarray(clean).astype(jnp.complex64), 128, center=True)
            return float(np.mean(np.asarray(si_sdr(audio, ref_audio))))

        a, b = recon_sisdr(den_j), recon_sisdr(den_t)
        assert abs(a - b) < 0.1, (a, b)
