"""BN-folded bf16 inference path: exactness vs the live-BN forward.

The fold is algebraically exact (same identity the int8 path uses,
``models/int8.py:38-47``); these tests pin that the *bf16* production
variant stays within bf16 rounding of the unfolded graph for every model
family that can reach serving: plain UNet, width-scaled students, the
complex-mask head (bounded + residual), and the attention-bottleneck
variant — at the training crop and at odd whole-clip eval shapes
(``/root/reference/code/test.py:100-114`` evaluates at (257, T)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models import (
    ComplexMaskUNet,
    FoldedUNet,
    UNet,
    fold_for_inference,
    fold_runner_inputs,
)
from audiodenoiser_tpu.train.loop import create_train_state, train_step

TINY = dict(features=(8, 16), bottleneck=32)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _randomize_bn(variables, rng):
    """Non-trivial BN params + running stats so the fold is actually load-
    bearing (fresh init has scale=1, bias=0, mean=0, var=1)."""

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        arr = np.asarray(leaf)
        if "bn" not in name:
            return leaf
        if name.endswith("mean") or name.endswith("bias"):
            return jnp.asarray(
                0.3 * rng.standard_normal(arr.shape), jnp.float32
            )
        if name.endswith("var"):
            return jnp.asarray(
                0.5 + np.abs(rng.standard_normal(arr.shape)), jnp.float32
            )
        if name.endswith("scale"):
            return jnp.asarray(
                1.0 + 0.2 * rng.standard_normal(arr.shape), jnp.float32
            )
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, variables)


@pytest.fixture(scope="module")
def trained_tiny():
    """A briefly-fit tiny UNet (realistic weights + running BN stats)."""
    model = UNet(**TINY)
    state = create_train_state(jax.random.key(0), model,
                               input_shape=(1, 32, 32, 1))
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(np.abs(rng.standard_normal((4, 32, 32, 1))),
                        jnp.float32)
    clean = noisy * 0.8
    for _ in range(20):
        state, _ = train_step(state, noisy, clean)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables, noisy


class TestFoldExactness:
    def test_f32_fold_is_exact(self, trained_tiny):
        """Folded at f32 compute == unfolded eval forward to float tol."""
        model, variables, noisy = trained_tiny
        ref = model.apply(variables, noisy, train=False)
        fm, fv = fold_runner_inputs(model, variables, dtype=jnp.float32)
        out = jax.jit(fm.apply)(fv, noisy)
        assert _rel(out, ref) < 1e-5

    def test_bf16_fold_matches_bf16_model(self, trained_tiny):
        """Production bf16 fold stays within bf16 rounding of the live-BN
        bf16 graph (the serving A/B that matters)."""
        _, variables, noisy = trained_tiny
        bf16_model = UNet(dtype=jnp.bfloat16, **TINY)
        ref = bf16_model.apply(variables, noisy, train=False)
        fm, fv = fold_runner_inputs(bf16_model, variables)
        assert fm.dtype == jnp.bfloat16
        out = jax.jit(fm.apply)(fv, noisy)
        assert _rel(out, ref) < 0.02, _rel(out, ref)

    def test_odd_eval_shape(self, trained_tiny):
        """Whole-clip eval shapes (odd freq/time) ride the same pad logic."""
        model, variables, _ = trained_tiny
        rng = np.random.default_rng(1)
        x = jnp.asarray(np.abs(rng.standard_normal((2, 33, 21, 1))),
                        jnp.float32)
        ref = model.apply(variables, x, train=False)
        fm, fv = fold_runner_inputs(model, variables, dtype=jnp.float32)
        out = jax.jit(fm.apply)(fv, x)
        assert out.shape == ref.shape
        assert _rel(out, ref) < 1e-5

    def test_train_mode_rejected(self, trained_tiny):
        model, variables, noisy = trained_tiny
        fm, fv = fold_runner_inputs(model, variables)
        with pytest.raises(ValueError, match="inference-only"):
            fm.apply(fv, noisy, train=True)


class TestMaskFamily:
    def test_residual_mask_head_folds(self):
        rng = np.random.default_rng(2)
        model = ComplexMaskUNet(mask_bound=4.0, residual=True, **TINY)
        feats = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.key(0), feats)
        variables = _randomize_bn(variables, rng)
        ref = model.apply(variables, feats, train=False)
        fm, fv = fold_runner_inputs(model, variables, dtype=jnp.float32)
        assert fm.mask_bound == 4.0 and fm.mask_residual
        out = jax.jit(fm.apply)(fv, feats)
        assert out.shape == ref.shape  # (..., 2) mask channels
        assert _rel(out, ref) < 1e-5

    def test_nonresidual_mask_head_folds(self):
        rng = np.random.default_rng(3)
        model = ComplexMaskUNet(mask_bound=2.0, residual=False, **TINY)
        feats = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
        variables = _randomize_bn(model.init(jax.random.key(1), feats), rng)
        ref = model.apply(variables, feats, train=False)
        fm, fv = fold_runner_inputs(model, variables, dtype=jnp.float32)
        assert not fm.mask_residual
        assert _rel(jax.jit(fm.apply)(fv, feats), ref) < 1e-5


class TestAttentionVariant:
    def test_attn_bottleneck_carried_through(self):
        rng = np.random.default_rng(4)
        model = UNet(attn_bottleneck=True, **TINY)
        x = jnp.asarray(np.abs(rng.standard_normal((2, 32, 32, 1))),
                        jnp.float32)
        variables = _randomize_bn(model.init(jax.random.key(2), x), rng)
        # make the attention block non-trivial (zero-init out projection
        # would otherwise make it a no-op and mask wiring bugs)
        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        out_kernel = p["bottleneck_attn"]["mhsa"]["out"]["kernel"]
        p["bottleneck_attn"]["mhsa"]["out"]["kernel"] = (
            0.1 * rng.standard_normal(out_kernel.shape).astype(np.float32)
        )
        variables = {"params": p, "batch_stats": variables["batch_stats"]}
        ref = model.apply(variables, x, train=False)
        fm, fv = fold_runner_inputs(model, variables, dtype=jnp.float32)
        assert fm.attn_bottleneck
        out = jax.jit(fm.apply)(fv, x)
        assert _rel(out, ref) < 1e-5


class TestRunnerIntegration:
    def test_fused_denoise_matches_unfolded(self, trained_tiny):
        """FoldedUNet drops into DenoiserRunner: fused STFT->net->iSTFT
        output matches the unfolded runner within bf16 rounding."""
        from audiodenoiser_tpu.eval.runner import DenoiserRunner

        _, variables, _ = trained_tiny
        model = UNet(dtype=jnp.bfloat16, **TINY)
        rng = np.random.default_rng(5)
        audio = jnp.asarray(
            np.clip(0.2 * rng.standard_normal((2, 4096)), -1, 1), jnp.float32
        )
        key = jax.random.key(3)
        base = DenoiserRunner(model, variables)
        ref = base.denoise_audio(audio, key)
        fm, fv = fold_runner_inputs(model, variables)
        folded = DenoiserRunner(fm, fv)
        out = folded.denoise_audio(audio, key)
        assert _rel(out, ref) < 0.05, _rel(out, ref)


class TestFoldedTreeShape:
    def test_no_bn_left_in_folded_tree(self, trained_tiny):
        _, variables, _ = trained_tiny
        folded = fold_for_inference(variables["params"],
                                    variables["batch_stats"],
                                    features=TINY["features"])
        names = jax.tree_util.tree_map_with_path(
            lambda p, _: "/".join(str(q.key) for q in p
                                  if hasattr(q, "key")),
            folded,
        )
        for name in jax.tree_util.tree_leaves(names):
            assert "bn" not in name, name

    def test_kernels_cast_biases_f32(self, trained_tiny):
        _, variables, _ = trained_tiny
        folded = fold_for_inference(variables["params"],
                                    variables["batch_stats"],
                                    features=TINY["features"])
        assert folded["down0"]["conv0"]["kernel"].dtype == jnp.bfloat16
        assert folded["down0"]["conv0"]["bias"].dtype == jnp.float32
        assert folded["up0_deconv"]["kernel"].dtype == jnp.bfloat16
