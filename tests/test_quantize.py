"""Int8 quantized export: size reduction, accuracy, loader transparency."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models import UNet, count_params
from audiodenoiser_tpu.train import create_train_state, export_model, load_exported
from audiodenoiser_tpu.train.quantize import (
    dequantize_tree,
    is_quantized,
    quantize_tree,
)


@pytest.fixture(scope="module")
def state():
    model = UNet(features=(8, 16), bottleneck=32)
    return create_train_state(jax.random.key(0), model, input_shape=(1, 32, 32, 1))


class TestQuantizeTree:
    def test_roundtrip_error_bounded(self, state):
        q = quantize_tree(state.params)
        assert is_quantized(q)
        dq = dequantize_tree(q)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.params)),
            jax.tree_util.tree_leaves(dq),
        ):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            # per-channel symmetric int8: error <= scale/2 = absmax/254
            tol = max(1e-8, np.abs(a).max() / 127.0)
            np.testing.assert_allclose(a, b, atol=tol)

    def test_non_kernel_leaves_pass_through(self, state):
        q = quantize_tree(state.params)
        # BN scales are 1-D and must remain exact float32
        flat = jax.tree_util.tree_flatten_with_path(
            q, is_leaf=lambda x: isinstance(x, dict) and "__q8__" in x
        )[0]
        bn = [v for k, v in flat if "bn" in jax.tree_util.keystr(k)]
        assert bn and all(not isinstance(v, dict) for v in bn)


class TestQuantizedExport:
    def test_size_reduction_and_forward_accuracy(self, state, tmp_path, rng):
        model = UNet(features=(8, 16), bottleneck=32)
        params = jax.device_get(state.params)
        bs = jax.device_get(state.batch_stats)
        p32 = str(tmp_path / "f32.ckpt")
        p8 = str(tmp_path / "int8.ckpt")
        export_model(p32, params, bs)
        export_model(p8, params, bs, quantize=True)
        assert os.path.getsize(p8) < 0.45 * os.path.getsize(p32)

        loaded = load_exported(p8)
        x = jnp.asarray(np.abs(rng.standard_normal((1, 64, 64, 1))), jnp.float32)
        ref = model.apply({"params": params, "batch_stats": bs}, x, train=False)
        out = model.apply(
            {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
            x, train=False,
        )
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / scale < 0.05  # int8 weights: small relative deviation

    def test_loader_transparent_with_template(self, state, tmp_path):
        model = UNet(features=(8, 16), bottleneck=32)
        p8 = str(tmp_path / "q.ckpt")
        export_model(
            p8, jax.device_get(state.params), jax.device_get(state.batch_stats),
            quantize=True,
        )
        template = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        loaded = load_exported(p8, template)
        assert count_params(loaded["params"]) == count_params(state.params)

    def test_eval_loader_accepts_quantized(self, state, tmp_path):
        from audiodenoiser_tpu.eval.runner import load_model_for_noise

        model = UNet(features=(8, 16), bottleneck=32)
        export_model(
            str(tmp_path / "unet_denoiser_white.ckpt"),
            jax.device_get(state.params), jax.device_get(state.batch_stats),
            quantize=True,
        )
        m, variables = load_model_for_noise("white", str(tmp_path), model=model)
        out = m.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 64, 64, 1)

    def test_import_cli_quantize_flag(self, tmp_path):
        import sys

        import torch

        sys.path.insert(0, "/root/reference/code")
        from model import UNet as TorchUNet  # oracle fixture

        from audiodenoiser_tpu.cli.import_checkpoint import main

        torch.manual_seed(0)
        tm = TorchUNet(1, 1)
        src = str(tmp_path / "unet_denoiser_white.pth")
        torch.save(tm.state_dict(), src)
        main(["--saved_models_dir", str(tmp_path), "--quantize"])
        ck = str(tmp_path / "unet_denoiser_white.ckpt")
        assert os.path.exists(ck)
        assert os.path.getsize(ck) < 0.45 * os.path.getsize(src)
