"""Width-scaled compact model family (--width_mult).

The reference has exactly one architecture (31,042,369 params,
``model.py:53-68``). The TPU framework adds a width-multiplier family for
latency-bound serving: channel widths scale by ``width_mult`` (rounded to
multiples of 8 for MXU lanes), the multiplier rides the checkpoint sidecar,
and every loader rebuilds the scaled architecture transparently.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models.unet import UNet, scaled_widths


def _param_count(model, in_ch=1):
    v = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, in_ch)))
    )
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))


class TestScaledWidths:
    def test_unit_width_is_reference(self):
        assert scaled_widths(1.0) == ((64, 128, 256, 512), 1024)

    @pytest.mark.parametrize(
        "mult,feats,bottleneck,params",
        [
            (0.5, (32, 64, 128, 256), 512, 7_765_409),
            (0.25, (16, 32, 64, 128), 256, 1_943_761),
            (0.125, (8, 16, 32, 64), 128, 487_145),
        ],
    )
    def test_family_param_counts(self, mult, feats, bottleneck, params):
        got_f, got_b = scaled_widths(mult)
        assert (got_f, got_b) == (feats, bottleneck)
        assert _param_count(UNet(features=got_f, bottleneck=got_b)) == params

    def test_widths_are_lane_multiples(self):
        for mult in (0.1, 0.3, 0.7, 1.3):
            feats, bottleneck = scaled_widths(mult)
            assert all(f % 8 == 0 for f in feats) and bottleneck % 8 == 0

    def test_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            scaled_widths(0.0)

    def test_forward_shape(self):
        feats, bottleneck = scaled_widths(0.125)
        model = UNet(features=feats, bottleneck=bottleneck)
        v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        out = model.apply(v, jnp.zeros((2, 256, 64, 1)), train=False)
        assert out.shape == (2, 256, 64, 1)


class TestLoaderRoundTrip:
    def test_mask_loader_rebuilds_scaled_architecture(self, tmp_path):
        """A mask checkpoint exported with width_mult in its sidecar loads
        back into the scaled ComplexMaskUNet, not the default 31M one."""
        from audiodenoiser_tpu.eval.runner import load_model_for_noise
        from audiodenoiser_tpu.models import ComplexMaskUNet
        from audiodenoiser_tpu.train.checkpoints import export_model

        feats, bottleneck = scaled_widths(0.125)
        model = ComplexMaskUNet(
            features=feats, bottleneck=bottleneck, mask_bound=8.0, residual=True
        )
        v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        path = os.path.join(tmp_path, "mask_denoiser_white.ckpt")
        export_model(path, v["params"], v["batch_stats"])
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(
                {"width_mult": 0.125, "mask_bound": 8.0, "residual": True}, f
            )

        loaded_model, variables = load_model_for_noise(
            "white", str(tmp_path), dtype=jnp.float32, stem="mask_denoiser"
        )
        assert tuple(loaded_model.features) == feats
        assert loaded_model.bottleneck == bottleneck
        assert loaded_model.mask_bound == 8.0 and loaded_model.residual
        out = loaded_model.apply(
            variables, jnp.zeros((1, 64, 64, 3)), train=False
        )
        assert out.shape == (1, 64, 64, 2)

    def test_unet_loader_defaults_to_reference_width(self, tmp_path):
        """No sidecar -> the loader builds the reference architecture."""
        from audiodenoiser_tpu.eval.runner import load_model_for_noise
        from audiodenoiser_tpu.train.checkpoints import export_model

        feats, bottleneck = scaled_widths(0.125)
        model = UNet(features=feats, bottleneck=bottleneck)
        v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        path = os.path.join(tmp_path, "unet_denoiser_white.ckpt")
        export_model(path, v["params"], v["batch_stats"])
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump({"width_mult": 0.125}, f)
        loaded_model, _ = load_model_for_noise(
            "white", str(tmp_path), dtype=jnp.float32
        )
        assert tuple(loaded_model.features) == feats


class TestTrainCLI:
    def test_width_mult_trains_and_records_sidecar(self, tmp_path):
        """cli.train --width_mult exports a sidecar the eval loader uses to
        rebuild the compact student end to end (magnitude family)."""
        from audiodenoiser_tpu.cli.train import main
        from audiodenoiser_tpu.data.wav_io import write_wav
        from audiodenoiser_tpu.eval.runner import load_model_for_noise

        rng = np.random.default_rng(0)
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        write_wav(
            str(clean_dir / "a.wav"),
            np.clip(rng.standard_normal(40000) * 0.2, -1, 1),
            8000,
        )
        out = main(
            [
                "--base_dataset_path", str(tmp_path),
                "--pipeline", "on_device",
                "--model", "unet",
                "--noise_type", "white",
                "--width_mult", "0.125",
                "--epochs", "1",
                "--batch_size", "2",
                "--steps_per_epoch", "2",
                "--precision", "f32",
                "--run_name", "widthrun",
                "--output_path", str(tmp_path / "runs"),
                "--export_dir", str(tmp_path / "sm"),
            ]
        )
        assert np.isfinite(out["best_val"])
        with open(tmp_path / "sm" / "unet_denoiser_white.json") as f:
            assert json.load(f)["width_mult"] == 0.125
        model, variables = load_model_for_noise(
            "white", str(tmp_path / "sm"), dtype=jnp.float32
        )
        assert tuple(model.features) == (8, 16, 32, 64)
        out = model.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 64, 64, 1)


class TestEmaSidecar:
    def test_ema_export_gets_width_sidecar(self, tmp_path):
        """--ema_decay exports best_model_ema.ckpt; a width-scaled run must
        stamp its sidecar too or the EMA student can't be loaded."""
        from audiodenoiser_tpu.cli.train import main
        from audiodenoiser_tpu.data.wav_io import write_wav
        from audiodenoiser_tpu.eval.runner import load_model_from_path

        rng = np.random.default_rng(0)
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        write_wav(
            str(clean_dir / "a.wav"),
            np.clip(rng.standard_normal(40000) * 0.2, -1, 1),
            8000,
        )
        out = main(
            [
                "--base_dataset_path", str(tmp_path),
                "--pipeline", "on_device",
                "--model", "unet",
                "--noise_type", "white",
                "--width_mult", "0.125",
                "--ema_decay", "0.9",
                "--epochs", "1",
                "--batch_size", "2",
                "--steps_per_epoch", "2",
                "--precision", "f32",
                "--run_name", "emarun",
                "--output_path", str(tmp_path / "runs"),
            ]
        )
        ema_path = out["best_ema_path"]
        assert os.path.exists(ema_path)
        with open(os.path.splitext(ema_path)[0] + ".json") as f:
            assert json.load(f)["width_mult"] == 0.125
        model, variables = load_model_from_path(
            ema_path, dtype=jnp.float32, stem="unet_denoiser"
        )
        assert tuple(model.features) == (8, 16, 32, 64)
