"""U-Net parity: parameter count, shapes (train + odd eval sizes), BN state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models import UNet, count_params

REFERENCE_PARAM_COUNT = 31_042_369  # model.py:53-68, logged at train.py:127


@pytest.fixture(scope="module")
def model_and_vars():
    model = UNet()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
    return model, variables


class TestParams:
    def test_trainable_param_count_matches_reference(self, model_and_vars):
        _, variables = model_and_vars
        assert count_params(variables["params"]) == REFERENCE_PARAM_COUNT

    def test_batch_stats_exist(self, model_and_vars):
        _, variables = model_and_vars
        assert "batch_stats" in variables
        # 9 DoubleConv blocks x 2 BN layers, mean+var each
        leaves = jax.tree_util.tree_leaves(variables["batch_stats"])
        assert len(leaves) == 9 * 2 * 2


class TestShapes:
    def test_training_shape(self, model_and_vars):
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((2, 256, 64, 1)), train=False)
        assert out.shape == (2, 256, 64, 1)

    def test_reference_smoke_shape(self, model_and_vars):
        """model.py:97-101 smoke test: (1,1,256,256) -> same shape."""
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, 256, 256, 1)), train=False)
        assert out.shape == (1, 256, 256, 1)

    def test_odd_eval_shape(self, model_and_vars):
        """test.py feeds whole (257, 188) clips; up-path padding must cope."""
        model, variables = model_and_vars
        out = model.apply(variables, jnp.zeros((1, 257, 188, 1)), train=False)
        assert out.shape == (1, 257, 188, 1)


class TestTrainMode:
    def test_batch_stats_update_in_train_mode(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 1)), jnp.float32
        )
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == x.shape
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_eval_mode_is_deterministic(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.ones((1, 64, 64, 1))
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMixedPrecision:
    def test_bf16_compute_f32_params(self):
        model = UNet(dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        assert count_params(variables["params"]) == REFERENCE_PARAM_COUNT
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        out = model.apply(variables, jnp.ones((1, 64, 64, 1), jnp.float32))
        assert out.dtype == jnp.float32  # cast back to input dtype

    def test_grads_flow(self):
        model = UNet()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.ones((1, 32, 32, 1)),
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(out**2)

        grads = jax.grad(loss_fn)(variables["params"])
        norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
        assert any(n > 0 for n in norms)


class TestAttentionBottleneck:
    """UNet(attn_bottleneck=True): one residual MHSA block after the
    bottleneck convs, zero-init projection, fixed 2-D sin/cos positions."""

    TINY = dict(features=(8, 16, 24, 32), bottleneck=48)

    def test_zero_init_is_noop(self):
        base = UNet(**self.TINY)
        attn = UNet(attn_bottleneck=True, **self.TINY)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 48, 1)),
            jnp.float32,
        )
        vb = base.init(jax.random.key(0), x)
        va = attn.init(jax.random.key(0), x)
        # graft the conv weights; the attention block is additive-only
        pa = dict(va["params"])
        pa.update(vb["params"])
        a = jax.jit(lambda v, x: base.apply(v, x, train=False))(vb, x)
        b = jax.jit(lambda v, x: attn.apply(v, x, train=False))(
            {"params": pa, "batch_stats": vb["batch_stats"]}, x
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_generic_positions(self):
        # eval clips hit bottleneck grids unseen at train time; the sin/cos
        # positions are computed from the trace-time dims so the SAME
        # params must serve both
        attn = UNet(attn_bottleneck=True, **self.TINY)
        v = attn.init(jax.random.key(0), jnp.zeros((1, 32, 48, 1)))
        out = jax.jit(lambda v, x: attn.apply(v, x, train=False))(
            v, jnp.zeros((1, 48, 37, 1))
        )
        assert out.shape == (1, 48, 37, 1)

    def test_attention_params_exist_and_grads_flow(self):
        attn = UNet(attn_bottleneck=True, **self.TINY)
        x = jnp.ones((1, 32, 48, 1))
        v = attn.init(jax.random.key(1), x)
        assert "bottleneck_attn" in v["params"]

        def loss_fn(params):
            out, _ = attn.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(out ** 2)

        g = jax.grad(loss_fn)(v["params"])
        # at zero-init the q/k/v grads are zero (they flow through the
        # zero out-projection); the out-projection itself trains first
        out_k = g["bottleneck_attn"]["mhsa"]["out"]["kernel"]
        assert float(jnp.abs(out_k).max()) > 0

    def test_sidecar_roundtrip(self, tmp_path):
        from audiodenoiser_tpu.eval.runner import load_model_from_path
        from audiodenoiser_tpu.train.checkpoints import export_model

        attn = UNet(attn_bottleneck=True)
        template = jax.eval_shape(
            lambda: attn.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        )
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), template
        )
        path = str(tmp_path / "unet_denoiser_white.ckpt")
        export_model(path, variables["params"], variables["batch_stats"])
        import json

        with open(str(tmp_path / "unet_denoiser_white.json"), "w") as f:
            json.dump({"attn_bottleneck": True}, f)
        model, loaded = load_model_from_path(path, stem="unet")
        assert model.attn_bottleneck
        assert "bottleneck_attn" in loaded["params"]
