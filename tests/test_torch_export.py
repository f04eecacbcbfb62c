"""Flax -> torch .pth export: round-trip exactness + torch-oracle parity.

The export is the inverse of torch_import: converting an exported
state_dict back must reproduce the original variables bit-exactly, and the
reference torch model (/root/reference/code/model.py, used read-only as a
black-box oracle) loaded from an exported .pth must match the Flax
forward in eval mode.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train.torch_export import export_state_dict, save_pth
from audiodenoiser_tpu.train.torch_import import convert_state_dict

REF_CODE = "/root/reference/code"


@pytest.fixture(scope="module")
def variables():
    model = UNet()
    return jax.device_get(
        jax.jit(lambda k: model.init(k, jnp.zeros((1, 32, 32, 1))))(
            jax.random.key(42)
        )
    )


class TestRoundTrip:
    def test_export_import_is_identity(self, variables):
        back = convert_state_dict(export_state_dict(variables))
        for coll in ("params", "batch_stats"):
            a = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
            b = jax.tree_util.tree_flatten_with_path(back[coll])[0]
            assert len(a) == len(b)
            for (pa, va), (pb, vb) in zip(a, b):
                assert pa == pb
                np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_state_dict_keys_and_batches_tracked(self, variables):
        sd = export_state_dict(variables)
        # every BN layer carries the num_batches_tracked long tensor
        # torch's strict load_state_dict requires
        nbt = [k for k in sd if k.endswith("num_batches_tracked")]
        assert len(nbt) == 18  # 9 double-convs x 2 BN layers
        assert all(sd[k].dtype == np.int64 for k in nbt)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_CODE, "model.py")),
    reason="reference checkout unavailable",
)
class TestTorchOracle:
    def test_reference_model_loads_and_matches(self, variables, tmp_path):
        sys.path.insert(0, REF_CODE)
        from model import UNet as TorchUNet  # noqa: the reference oracle

        p = str(tmp_path / "unet_denoiser_white.pth")
        save_pth(variables, p)
        m = TorchUNet(in_channels=1, num_classes=1)
        m.load_state_dict(
            torch.load(p, map_location="cpu", weights_only=True), strict=True
        )
        m.eval()

        rng = np.random.default_rng(0)
        x = np.abs(rng.standard_normal((2, 64, 64))).astype(np.float32)
        with torch.no_grad():
            ref = m(torch.from_numpy(x).unsqueeze(1)).squeeze(1).numpy()
        ours = np.asarray(
            UNet().apply(variables, jnp.asarray(x)[..., None], train=False)
        )[..., 0]
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestCLI:
    def test_export_checkpoint_cli(self, variables, tmp_path, capsys):
        from audiodenoiser_tpu.cli.export_checkpoint import main
        from audiodenoiser_tpu.train.checkpoints import export_model

        ck = str(tmp_path / "unet_denoiser_urban.ckpt")
        export_model(ck, variables["params"], variables["batch_stats"])
        main(["--saved_models_dir", str(tmp_path)])
        assert "converted" in capsys.readouterr().out
        p = str(tmp_path / "unet_denoiser_urban.pth")
        assert os.path.exists(p)
        sd = torch.load(p, map_location="cpu", weights_only=True)
        back = convert_state_dict(sd)
        for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(variables["params"])[0],
            jax.tree_util.tree_flatten_with_path(back["params"])[0],
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=1e-7
            )
