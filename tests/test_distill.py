"""Knowledge distillation for compact mask students (--distill_from).

The teacher's masked spectrum enters the student objective as an L1 term
(train/mask.py); the teacher is frozen (stop_gradient) and loaded by
checkpoint path with its architecture sidecar.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models.complex_mask import ComplexMaskUNet
from audiodenoiser_tpu.train.mask import create_mask_train_state, make_mask_steps

TINY = dict(features=(4, 8), bottleneck=16)


def _tiny_model(**kw):
    return ComplexMaskUNet(**TINY, **kw)


def _teacher():
    model = _tiny_model(mask_bound=2.0, residual=True, zero_out_init=True)
    v = model.init(jax.random.key(7), jnp.zeros((1, 64, 64, 3)))
    # perturb so the teacher is NOT the identity mask (zero_out_init)
    v = jax.tree_util.tree_map(lambda p: p + 0.01, v)
    return model, {"params": v["params"], "batch_stats": v["batch_stats"]}


def _batch(key, n=2):
    k1, k2 = jax.random.split(key)
    clean = 0.2 * jax.random.normal(k1, (n, 16000))
    noisy = clean + 0.1 * jax.random.normal(k2, (n, 16000))
    return noisy, clean


class TestDistillLoss:
    def test_distill_term_changes_total(self):
        """With a non-identity teacher the distill term must be nonzero."""
        t_model, t_vars = _teacher()
        state = create_mask_train_state(
            jax.random.key(0), _tiny_model(residual=True, zero_out_init=True)
        )
        noisy, clean = _batch(jax.random.key(1))
        _, ev_plain = make_mask_steps(0.0)
        _, ev_distill = make_mask_steps(
            0.0, teacher=(t_model.apply, t_vars), distill_weight=1.0
        )
        plain = float(ev_plain(state, noisy, clean).total)
        distilled = float(ev_distill(state, noisy, clean).total)
        assert distilled > plain  # identity student != perturbed teacher

    def test_distill_gradient_pulls_student_toward_teacher(self):
        """Training with ONLY a strong distill term shrinks the
        student-teacher mask gap."""
        t_model, t_vars = _teacher()
        state = create_mask_train_state(
            jax.random.key(0),
            _tiny_model(residual=True, zero_out_init=True),
            learning_rate=1e-2,
        )
        tr, ev = make_mask_steps(
            0.0, teacher=(t_model.apply, t_vars), distill_weight=50.0
        )
        noisy, clean = _batch(jax.random.key(1))
        first = float(ev(state, noisy, clean).total)
        for i in range(5):
            state, _ = tr(state, noisy, clean)
        last = float(ev(state, noisy, clean).total)
        assert last < first


class TestDistillCLI:
    def test_distill_from_rejects_magnitude_family(self, tmp_path):
        from audiodenoiser_tpu.cli.train import main

        with pytest.raises(SystemExit):
            main(
                [
                    "--base_dataset_path", str(tmp_path),
                    "--pipeline", "on_device",
                    "--model", "unet",
                    "--noise_type", "white",
                    "--distill_from", "whatever.ckpt",
                ]
            )

    def test_distill_trains_student_against_exported_teacher(
        self, tmp_path, monkeypatch
    ):
        """End to end: export a tiny teacher, train a student with
        --distill_from, and confirm the sidecar records provenance."""
        import audiodenoiser_tpu.models as models_pkg
        import audiodenoiser_tpu.models.complex_mask as cm
        from audiodenoiser_tpu.data.wav_io import write_wav
        from audiodenoiser_tpu.train.checkpoints import export_model

        real = cm.ComplexMaskUNet

        def tiny(dtype=jnp.float32, **kw):
            kw = {**TINY, **{k: v for k, v in kw.items()
                             if k not in ("features", "bottleneck")}}
            return real(dtype=dtype, **kw)

        monkeypatch.setattr(cm, "ComplexMaskUNet", tiny)
        monkeypatch.setattr(models_pkg, "ComplexMaskUNet", tiny)

        t_model, t_vars = _teacher()
        t_path = tmp_path / "mask_denoiser_teacher.ckpt"
        export_model(str(t_path), t_vars["params"], t_vars["batch_stats"])
        # sidecar WITHOUT width_mult: the monkeypatched loader template
        # must match the tiny teacher, so describe it via the real model's
        # sidecar contract (mask head only; tiny widths come from the
        # monkeypatch inside load_model_from_path's ComplexMaskUNet)
        with open(tmp_path / "mask_denoiser_teacher.json", "w") as f:
            json.dump({"mask_bound": 2.0, "residual": True}, f)
        import audiodenoiser_tpu.eval.runner as runner_mod

        monkeypatch.setattr(runner_mod, "ComplexMaskUNet", tiny, raising=False)

        from audiodenoiser_tpu.cli.train import main

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
                "--model", "complex_mask",
                "--noise_type", "white",
                "--distill_from", str(t_path),
                "--distill_weight", "1.0",
                "--epochs", "1",
                "--batch_size", "2",
                "--steps_per_epoch", "2",
                "--precision", "f32",
                "--run_name", "distillrun",
                "--output_path", str(tmp_path / "runs"),
                "--export_dir", str(tmp_path / "sm"),
            ]
        )
        assert np.isfinite(out["best_val"])
        with open(tmp_path / "sm" / "mask_denoiser_white.json") as f:
            meta = json.load(f)
        assert meta["distilled_from"] == str(t_path)


class TestFeatureDistill:
    """--distill_features: attention transfer at the U-Net bottleneck."""

    def test_feature_term_zero_when_student_is_teacher(self):
        """Identical student/teacher weights -> identical attention maps
        -> the feature term adds exactly nothing."""
        t_model, t_vars = _teacher()
        state = create_mask_train_state(
            jax.random.key(0), _tiny_model(mask_bound=2.0, residual=True,
                                           zero_out_init=True)
        )
        state = state.replace(
            params=t_vars["params"], batch_stats=t_vars["batch_stats"]
        )
        noisy, clean = _batch(jax.random.key(1))
        _, ev_plain = make_mask_steps(0.0)
        _, ev_feat = make_mask_steps(
            0.0, teacher=(t_model.apply, t_vars), distill_feat_weight=5.0
        )
        plain = float(ev_plain(state, noisy, clean).total)
        feat = float(ev_feat(state, noisy, clean).total)
        np.testing.assert_allclose(feat, plain, rtol=1e-6)

    def test_feature_term_nonzero_for_different_student(self):
        t_model, t_vars = _teacher()
        state = create_mask_train_state(
            jax.random.key(3), _tiny_model(residual=True, zero_out_init=True)
        )
        noisy, clean = _batch(jax.random.key(1))
        _, ev_plain = make_mask_steps(0.0)
        _, ev_feat = make_mask_steps(
            0.0, teacher=(t_model.apply, t_vars), distill_feat_weight=5.0
        )
        plain = float(ev_plain(state, noisy, clean).total)
        feat = float(ev_feat(state, noisy, clean).total)
        assert feat > plain

    def test_feature_term_works_across_widths(self):
        """The attention map is channel-count independent: a narrower
        student trains against the full tiny teacher, and the gradient
        reduces the feature gap."""
        t_model, t_vars = _teacher()
        narrow = ComplexMaskUNet(
            features=(2, 4), bottleneck=8, residual=True, zero_out_init=True
        )
        state = create_mask_train_state(
            jax.random.key(0), narrow, learning_rate=1e-3
        )
        tr, _ = make_mask_steps(
            0.0, teacher=(t_model.apply, t_vars), distill_feat_weight=10.0
        )
        noisy, clean = _batch(jax.random.key(1))
        # compare train-mode totals (eval mode sees shifting BatchNorm
        # running stats early in training, which confounds the term)
        totals = []
        for _ in range(10):
            state, losses = tr(state, noisy, clean)
            totals.append(float(losses.total))
        assert np.all(np.isfinite(totals))
        assert totals[-1] < totals[0]

    def test_cli_rejects_features_without_teacher(self, tmp_path):
        from audiodenoiser_tpu.cli.train import main

        with pytest.raises(SystemExit):
            main(
                [
                    "--base_dataset_path", str(tmp_path),
                    "--pipeline", "on_device",
                    "--model", "complex_mask",
                    "--noise_type", "white",
                    "--distill_features", "1.0",
                ]
            )
