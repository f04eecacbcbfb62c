"""Int8 MXU inference path: BN folding exactness, quantized-forward quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.losses import combined_perceptual_loss
from audiodenoiser_tpu.models import Int8UNet, UNet, prepare_int8
from audiodenoiser_tpu.models.int8 import _fold_conv_bn
from audiodenoiser_tpu.train.loop import create_train_state, train_step


@pytest.fixture(scope="module")
def trained_tiny():
    """A briefly-fit tiny UNet (realistic weights + running BN stats)."""
    model = UNet(features=(8, 16), bottleneck=32)
    state = create_train_state(jax.random.key(0), model, input_shape=(1, 32, 32, 1))
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(np.abs(rng.standard_normal((4, 32, 32, 1))), jnp.float32)
    clean = noisy * 0.8
    for _ in range(20):
        state, _ = train_step(state, noisy, clean)
    return model, state, noisy, clean


class TestBatchNormFold:
    def test_fold_matches_conv_bn_eval(self, rng):
        """Folded conv == Conv -> eval BatchNorm exactly (pure f32)."""
        from flax import linen as nn

        class ConvBN(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(16, (3, 3), padding="SAME", name="conv")(x)
                return nn.BatchNorm(
                    use_running_average=True, momentum=0.9, epsilon=1e-5,
                    name="bn",
                )(x)

        m = ConvBN()
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
        variables = m.init(jax.random.key(0), x)
        # non-trivial running stats
        variables = jax.tree_util.tree_map(lambda a: a, variables)
        bs = {
            "mean": jnp.asarray(rng.standard_normal(16), jnp.float32),
            "var": jnp.abs(jnp.asarray(rng.standard_normal(16), jnp.float32)) + 0.5,
        }
        params = {
            "conv": variables["params"]["conv"],
            "bn": {
                "scale": jnp.asarray(1 + 0.1 * rng.standard_normal(16), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(16), jnp.float32),
            },
        }
        ref = m.apply({"params": params, "batch_stats": {"bn": bs}}, x)
        k, b = _fold_conv_bn(params["conv"], params["bn"], bs)
        ours = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestInt8Forward:
    def test_close_to_f32_forward(self, trained_tiny):
        model, state, noisy, _ = trained_tiny
        f32 = np.asarray(
            model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                noisy, train=False,
            )
        )
        q = prepare_int8(state.params, state.batch_stats, features=(8, 16))
        i8m = Int8UNet(features=(8, 16))
        i8 = np.asarray(jax.jit(i8m.apply)(q, noisy))
        rel = np.linalg.norm(i8 - f32) / np.linalg.norm(f32)
        assert rel < 0.1, rel

    def test_eval_metric_delta_small(self, trained_tiny):
        """Quality gate: the combined perceptual loss vs clean moves by <5%
        relative when swapping the bf16 forward for int8 compute."""
        model, state, noisy, clean = trained_tiny
        f32 = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            noisy, train=False,
        )
        q = prepare_int8(state.params, state.batch_stats, features=(8, 16))
        i8 = Int8UNet(features=(8, 16)).apply(q, noisy)
        loss_f = float(combined_perceptual_loss(f32, clean).total)
        loss_q = float(combined_perceptual_loss(i8, clean).total)
        assert abs(loss_q - loss_f) / max(abs(loss_f), 1e-9) < 0.05, (loss_q, loss_f)

    def test_output_dtype_follows_input(self, trained_tiny):
        model, state, noisy, _ = trained_tiny
        q = prepare_int8(state.params, state.batch_stats, features=(8, 16))
        out = Int8UNet(features=(8, 16)).apply(q, noisy.astype(jnp.bfloat16))
        assert out.dtype == jnp.bfloat16

    def test_train_mode_rejected(self, trained_tiny):
        model, state, noisy, _ = trained_tiny
        q = prepare_int8(state.params, state.batch_stats, features=(8, 16))
        with pytest.raises(ValueError):
            Int8UNet(features=(8, 16)).apply(q, noisy, train=True)

    def test_runs_through_denoiser_runner(self, trained_tiny):
        """The shim drops into the fused waveform pipeline unchanged."""
        from audiodenoiser_tpu.eval.runner import DenoiserRunner

        model, state, _, _ = trained_tiny
        q = prepare_int8(state.params, state.batch_stats, features=(8, 16))
        runner = DenoiserRunner(Int8UNet(features=(8, 16)), q)
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 4096)), jnp.float32
        ) * 0.1
        out = runner.denoise_audio(audio, jax.random.key(0), mode="noisy_phase")
        assert out.shape == audio.shape
        assert np.all(np.isfinite(np.asarray(out)))
