"""Complex-ratio-mask model family: masking math, training, fused inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiodenoiser_tpu.dsp.stft as S
from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.models.complex_mask import (
    ComplexMaskUNet,
    apply_mask,
    denoise_waveform,
    spectrogram_features,
)
from audiodenoiser_tpu.train.mask import (
    create_mask_train_state,
    mask_eval_step,
    mask_train_step,
)


def _tiny():
    return ComplexMaskUNet(features=(4, 8), bottleneck=16)


class TestMaskMath:
    def test_features_shape_and_content(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        spec = S.stft(x, 512, 128)
        feats = spectrogram_features(spec)
        assert feats.shape == (*spec.shape, 3)
        np.testing.assert_allclose(
            np.asarray(feats[..., 0]), np.abs(np.asarray(spec)), atol=1e-5
        )
        # unit phase: cos^2 + sin^2 == 1
        np.testing.assert_allclose(
            np.asarray(feats[..., 1] ** 2 + feats[..., 2] ** 2), 1.0, atol=1e-4
        )

    def test_identity_mask_preserves_spec(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
        spec = S.stft(x, 512, 128)
        ones = jnp.stack(
            [jnp.ones(spec.shape), jnp.zeros(spec.shape)], axis=-1
        )
        out = apply_mask(ones, spec)
        np.testing.assert_allclose(np.asarray(out), np.asarray(spec), atol=1e-6)

    def test_residual_mask_is_identity_at_init(self, rng):
        """residual=True: M = (1,0) + K tanh(out) — a freshly-initialized
        network passes audio through exactly (the zero-function prior that
        protects gate-never-fired clips, round-3 nc fix)."""
        from audiodenoiser_tpu.models.complex_mask import denoise_waveform

        model = ComplexMaskUNet(
            features=(4, 8), bottleneck=16, residual=True, mask_bound=8.0
        )
        # zero the final conv so out == 0 exactly (init bias is 0; the
        # kernel init is random, so zero it to probe the parametrization)
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        v = jax.tree_util.tree_map(lambda x: x, v)
        v["params"]["out"]["kernel"] = jnp.zeros_like(
            v["params"]["out"]["kernel"]
        )
        x = jnp.asarray(
            np.clip(rng.standard_normal(8000) * 0.2, -1, 1).astype(np.float32)
        )
        y = denoise_waveform(model, v, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_mask_is_bounded(self, rng):
        model = _tiny()
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        big = jnp.ones((1, 64, 64, 3)) * 1e3
        mask = np.asarray(model.apply(v, big, train=False))
        assert mask.shape[-1] == 2
        assert np.abs(mask).max() <= model.mask_bound + 1e-5


class TestMaskTraining:
    def test_loss_decreases(self, rng):
        state = create_mask_train_state(
            jax.random.key(0), _tiny(), learning_rate=1e-3
        )
        clean = jnp.asarray(
            np.clip(rng.standard_normal((2, 16000)) * 0.2, -1, 1).astype(np.float32)
        )
        noisy = jnp.clip(
            clean + 0.1 * jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32)),
            -1, 1,
        )
        first = None
        for _ in range(15):
            state, losses = mask_train_step(state, noisy, clean)
            if first is None:
                first = float(losses.total)
        assert float(losses.total) < first

    def test_eval_step_runs(self, rng):
        state = create_mask_train_state(jax.random.key(0), _tiny())
        a = jnp.asarray(np.zeros((1, 16000), np.float32))
        out = mask_eval_step(state, a, a)
        assert np.isfinite(float(out.total))

    def test_si_sdr_objective_improves_si_sdr(self, rng):
        """make_mask_steps(si_sdr_weight>0) trains the deployment metric:
        after a few steps on a fixed batch, reconstruction SI-SDR rises
        (VERDICT r2 weak #1 — the spectral-only objective can regress it)."""
        from audiodenoiser_tpu.eval.metrics import si_sdr
        from audiodenoiser_tpu.models.complex_mask import denoise_waveform
        from audiodenoiser_tpu.train.mask import make_mask_steps

        model = _tiny()
        state = create_mask_train_state(
            jax.random.key(0), model, learning_rate=3e-3
        )
        weight = 4.0  # dominant term: the test isolates the SI-SDR drive
        train_step, eval_step = make_mask_steps(si_sdr_weight=weight)
        _, eval0 = make_mask_steps(0.0)
        clean = jnp.asarray(
            np.clip(rng.standard_normal((4, 16000)) * 0.2, -1, 1).astype(np.float32)
        )
        noisy = jnp.clip(
            clean
            + 0.1 * jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32)),
            -1, 1,
        )

        def mean_sdr(st):
            # the SI-SDR component implied by the weighted/unweighted eval
            # totals: total_w - total_0 = -w * mean_sdr / 20
            from audiodenoiser_tpu.train.mask import SI_SDR_SCALE

            tw = float(eval_step(st, noisy, clean).total)
            t0 = float(eval0(st, noisy, clean).total)
            return (t0 - tw) * SI_SDR_SCALE / weight

        before = mean_sdr(state)
        for _ in range(60):
            state, losses = train_step(state, noisy, clean)
        after = mean_sdr(state)
        assert after > before
        assert np.isfinite(float(losses.total))
        # and the full fused inference graph agrees with the eval-step view
        v = {"params": state.params, "batch_stats": state.batch_stats}
        direct = float(
            jnp.mean(si_sdr(denoise_waveform(model, v, noisy), clean))
        )
        np.testing.assert_allclose(direct, after, atol=1e-2)

    def test_si_sdr_term_changes_total(self, rng):
        """weight>0 really enters the objective (totals differ)."""
        from audiodenoiser_tpu.train.mask import make_mask_steps

        state = create_mask_train_state(jax.random.key(0), _tiny())
        _, ev0 = make_mask_steps(0.0)
        _, ev1 = make_mask_steps(1.0)
        clean = jnp.asarray(
            np.clip(rng.standard_normal((2, 16000)) * 0.2, -1, 1).astype(np.float32)
        )
        noisy = jnp.clip(clean * 0.5, -1, 1)
        t0 = float(ev0(state, noisy, clean).total)
        t1 = float(ev1(state, noisy, clean).total)
        assert t0 != t1

    def test_si_sdr_clamp_saturates_passthrough_reward(self, rng):
        """With a residual identity-init mask and clean==noisy input, the
        unclamped reward is the ~110 dB pass-through SI-SDR; clamping at
        30 dB caps it exactly (total_clamped - total_unclamped
        == w*(sdr-30)/20), and kills the gradient that otherwise pins the
        model to the identity (the round-3 noise_cancellation failure)."""
        from audiodenoiser_tpu.train.mask import SI_SDR_SCALE, make_mask_steps

        model = ComplexMaskUNet(
            features=(4, 8), bottleneck=16, residual=True, zero_out_init=True
        )
        state = create_mask_train_state(jax.random.key(0), model)
        clean = jnp.asarray(
            np.clip(rng.standard_normal((2, 16000)) * 0.2, -1, 1).astype(np.float32)
        )
        w = 1.0
        _, ev_raw = make_mask_steps(w)
        _, ev_cl = make_mask_steps(w, si_sdr_clamp=30.0)
        _, ev_0 = make_mask_steps(0.0)
        t_raw = float(ev_raw(state, clean, clean).total)
        t_cl = float(ev_cl(state, clean, clean).total)
        t_0 = float(ev_0(state, clean, clean).total)
        sdr_raw = (t_0 - t_raw) * SI_SDR_SCALE / w  # implied mean SI-SDR
        sdr_cl = (t_0 - t_cl) * SI_SDR_SCALE / w
        assert sdr_raw > 60.0  # identity-init pass-through is near-perfect
        np.testing.assert_allclose(sdr_cl, 30.0, atol=1e-3)


class TestFusedInference:
    def test_denoise_waveform_shape(self, rng):
        model = _tiny()
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        x = jnp.asarray(
            np.clip(rng.standard_normal(8000) * 0.2, -1, 1).astype(np.float32)
        )
        y = jax.jit(lambda v, x: denoise_waveform(model, v, x))(v, x)
        assert y.shape == x.shape

    def test_runner_complex_mask_mode(self, rng):
        model = _tiny()
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        runner = DenoiserRunner(model, v)
        x = jnp.asarray(
            np.clip(rng.standard_normal((2, 8000)) * 0.2, -1, 1).astype(np.float32)
        )
        y = runner.denoise_audio(x, jax.random.key(0), mode="complex_mask")
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))


class TestCLI:
    def test_train_cli_complex_mask(self, tmp_path, monkeypatch):
        import audiodenoiser_tpu.models.complex_mask as cm
        from audiodenoiser_tpu.data.wav_io import write_wav

        real = cm.ComplexMaskUNet
        monkeypatch.setattr(
            cm, "ComplexMaskUNet",
            lambda dtype=jnp.float32, **kw: real(
                features=(4, 8), bottleneck=16, dtype=dtype, **kw
            ),
        )
        from audiodenoiser_tpu.cli.train import main

        rng = np.random.default_rng(0)
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        write_wav(
            str(clean_dir / "a.wav"),
            np.clip(rng.standard_normal(40000) * 0.2, -1, 1), 8000,
        )
        out = main(
            [
                "--base_dataset_path", str(tmp_path),
                "--pipeline", "on_device",
                "--model", "complex_mask",
                "--noise_type", "white",
                "--epochs", "1",
                "--batch_size", "2",
                "--steps_per_epoch", "2",
                "--precision", "f32",
                "--run_name", "cmrun",
                "--output_path", str(tmp_path / "runs"),
                "--export_dir", str(tmp_path / "sm"),
            ]
        )
        import os

        assert os.path.exists(tmp_path / "sm" / "mask_denoiser_white.ckpt")
        assert np.isfinite(out["best_val"])
        # mask-head sidecar: bound + objective weight recorded for eval
        import json

        with open(tmp_path / "sm" / "mask_denoiser_white.json") as f:
            meta = json.load(f)
        assert meta["mask_bound"] == 2.0 and meta["si_sdr_weight"] == 0.5
        assert meta["residual"] is True

    def test_noise_cancellation_gets_wide_bound(self, tmp_path, monkeypatch):
        """The nc specialist defaults to mask_bound 8 (undoing 0.2x
        attenuation needs ~5x gain) and eval rebuilds the same head from
        the sidecar."""
        import audiodenoiser_tpu.models as models_pkg
        import audiodenoiser_tpu.models.complex_mask as cm
        from audiodenoiser_tpu.data.wav_io import write_wav

        real = cm.ComplexMaskUNet

        def tiny(dtype=jnp.float32, **kw):
            return real(features=(4, 8), bottleneck=16, dtype=dtype, **kw)

        monkeypatch.setattr(cm, "ComplexMaskUNet", tiny)
        monkeypatch.setattr(models_pkg, "ComplexMaskUNet", tiny)
        from audiodenoiser_tpu.cli.train import main

        rng = np.random.default_rng(0)
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        write_wav(
            str(clean_dir / "a.wav"),
            np.clip(rng.standard_normal(40000) * 0.2, -1, 1), 8000,
        )
        main(
            [
                "--base_dataset_path", str(tmp_path),
                "--pipeline", "on_device",
                "--model", "complex_mask",
                "--noise_type", "noise_cancellation",
                "--epochs", "1", "--batch_size", "2",
                "--steps_per_epoch", "1", "--precision", "f32",
                "--run_name", "ncrun",
                "--output_path", str(tmp_path / "runs"),
                "--export_dir", str(tmp_path / "sm"),
            ]
        )
        import json

        with open(tmp_path / "sm" / "mask_denoiser_noise_cancellation.json") as f:
            assert json.load(f)["mask_bound"] == 8.0
        from audiodenoiser_tpu.eval.runner import load_model_for_noise

        model, variables = load_model_for_noise(
            "noise_cancellation", str(tmp_path / "sm"), dtype=jnp.float32,
            stem="mask_denoiser",
        )
        assert model.mask_bound == 8.0

    def test_complex_mask_requires_on_device(self, tmp_path):
        from audiodenoiser_tpu.cli.train import main

        with pytest.raises(SystemExit):
            main(
                [
                    "--base_dataset_path", str(tmp_path),
                    "--model", "complex_mask",
                ]
            )


class TestMaskEvalCLI:
    def test_waveform_eval_via_test_cli(self, tmp_path, rng):
        """Export a tiny mask model, then drive the eval CLI end to end."""
        import os

        from audiodenoiser_tpu.cli.test import main as test_main
        from audiodenoiser_tpu.data.wav_io import write_wav
        from audiodenoiser_tpu.eval.runner import load_model_for_noise
        from audiodenoiser_tpu.train import export_model

        model = _tiny()
        state = create_mask_train_state(jax.random.key(0), model)
        sm = tmp_path / "saved_models"
        sm.mkdir()
        export_model(
            str(sm / "mask_denoiser_white.ckpt"),
            jax.device_get(state.params), jax.device_get(state.batch_stats),
        )
        clean_dir = tmp_path / "clean"
        noise_dir = tmp_path / "noise"
        clean_dir.mkdir(), noise_dir.mkdir()
        for i in range(2):
            write_wav(
                str(clean_dir / f"c{i}.wav"),
                np.clip(rng.standard_normal(16000) * 0.2, -1, 1), 8000,
            )
        # loader resolves the mask stem with an explicit small model
        m, v = load_model_for_noise("white", str(sm), model=model, stem="mask_denoiser")
        from audiodenoiser_tpu.eval.runner import test_noise_type_waveform

        metrics = test_noise_type_waveform(
            m, v, "white",
            clean_dir=str(clean_dir), noise_dir=str(noise_dir),
            output_dir=str(tmp_path / "out"), num_audio_examples=1,
        )
        assert np.isfinite(metrics["si_sdr"]) and np.isfinite(metrics["total"])
        assert os.path.exists(tmp_path / "out" / "white_metrics.txt")
        assert os.path.exists(tmp_path / "out" / "white_denoised_0.wav")
        txt = (tmp_path / "out" / "white_metrics.txt").read_text()
        assert "SI-SDR denoised" in txt

    def test_multiseed_eval_reports_mean_and_std(
        self, tmp_path, rng, monkeypatch
    ):
        """--n_seeds K repeats the corruption draw and reports mean +- std
        per metric; artifacts are written once (first seed only)."""
        import audiodenoiser_tpu.models as models_mod
        from audiodenoiser_tpu.cli.test import main as test_main
        from audiodenoiser_tpu.data.wav_io import write_wav
        from audiodenoiser_tpu.train import export_model

        real = ComplexMaskUNet
        monkeypatch.setattr(
            models_mod, "ComplexMaskUNet",
            lambda dtype=jnp.float32, **kw: real(
                features=(4, 8), bottleneck=16, dtype=dtype, **kw
            ),
        )
        model = _tiny()
        state = create_mask_train_state(jax.random.key(0), model)
        sm = tmp_path / "saved_models"
        sm.mkdir()
        export_model(
            str(sm / "mask_denoiser_white.ckpt"),
            jax.device_get(state.params), jax.device_get(state.batch_stats),
        )
        clean_dir = tmp_path / "clean"
        clean_dir.mkdir()
        for i in range(2):
            write_wav(
                str(clean_dir / f"c{i}.wav"),
                np.clip(rng.standard_normal(16000) * 0.2, -1, 1), 8000,
            )
        out = test_main(
            [
                "--model", "complex_mask", "--noise_types", "white",
                "--saved_models_dir", str(sm),
                "--clean_dir", str(clean_dir),
                "--noise_dir", str(tmp_path / "noise"),
                "--output_dir", str(tmp_path / "out"),
                "--n_seeds", "3", "--mesh", "off", "--precision", "f32",
                "--num_audio_examples", "0",
            ]
        )
        got = out["white"]
        assert "si_sdr" in got and "si_sdr_std" in got
        assert got["si_sdr_std"] >= 0
        multi = (tmp_path / "out" / "white_metrics_multiseed.txt").read_text()
        assert "3 corruption draws" in multi and "si_sdr:" in multi
        # single-seed artifacts written exactly once
        assert (tmp_path / "out" / "white_metrics.txt").exists()

    def test_missing_mask_model_skips(self, tmp_path, capsys):
        from audiodenoiser_tpu.cli.test import main as test_main

        out = test_main(
            [
                "--model", "complex_mask",
                "--saved_models_dir", str(tmp_path),
                "--clean_dir", str(tmp_path),
                "--noise_dir", str(tmp_path),
                "--output_dir", str(tmp_path / "o"),
            ]
        )
        assert out == {}
        assert "not found. Skipping." in capsys.readouterr().out
