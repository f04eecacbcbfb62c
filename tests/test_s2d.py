"""Space-to-depth stem variant (``UNet(s2d_stem=True)``).

The plain U-Net's first level runs at full spatial resolution with cin=1 —
measured HBM-bound in the fused-graph roofline (docs/STATUS.md). The s2d
variant packs each 2x2 input block into channels so level 0 runs at half
resolution (4x fewer level-0 activation bytes) and a sub-pixel 1x1 head
(out conv emits 4*out_channels, depth-to-space unpacks) restores full
resolution. These tests pin:

- space_to_depth/depth_to_space are exact inverses with the documented
  (a, b, c) channel order;
- forward shapes at the training crop AND odd whole-clip eval shapes
  (the reference evaluates at (257, T) — ``test.py:100-114``);
- the residual complex-mask head is still an exact identity at init
  (zero-init sub-pixel head -> mask == (1, 0) everywhere);
- BN folding carries the variant (within-bf16 parity, like the other
  families in tests/test_folded.py);
- the train/export/load sidecar round-trip rebuilds the variant.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.models import ComplexMaskUNet, UNet, fold_runner_inputs
from audiodenoiser_tpu.models.unet import depth_to_space, space_to_depth

TINY = dict(features=(8, 16), bottleneck=32)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


class TestS2DOps:
    def test_roundtrip_inverse(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 8, 6, 3)), jnp.float32)
        packed = space_to_depth(x)
        assert packed.shape == (2, 4, 3, 12)
        back = depth_to_space(packed, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_channel_order_row_major_phase(self):
        # pixel (2p+a, 2q+b, c) lands at channel (a*2 + b)*C + c
        x = jnp.arange(2 * 4 * 1, dtype=jnp.float32).reshape(1, 2, 4, 1)
        packed = np.asarray(space_to_depth(x))
        # block at p=0, q=0 covers pixels (0,0),(0,1),(1,0),(1,1)
        np.testing.assert_array_equal(
            packed[0, 0, 0], [x[0, 0, 0, 0], x[0, 0, 1, 0],
                              x[0, 1, 0, 0], x[0, 1, 1, 0]]
        )


class TestS2DUNet:
    def test_training_crop_shape_and_level0_halved(self):
        model = UNet(s2d_stem=True, **TINY)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        out, intermediates = model.apply(
            variables, jnp.zeros((2, 256, 64, 1)), train=False,
            capture_intermediates=True, mutable=["intermediates"],
        )
        assert out.shape == (2, 256, 64, 1)
        # conv0 kernel sees the packed 4-channel stem
        k = variables["params"]["down0"]["conv0"]["kernel"]
        assert k.shape == (3, 3, 4, TINY["features"][0])
        # sub-pixel head: 4*out_channels before depth-to-space
        assert variables["params"]["out"]["kernel"].shape[-1] == 4

    def test_odd_eval_shape(self):
        model = UNet(s2d_stem=True, **TINY)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        out = model.apply(variables, jnp.zeros((1, 257, 126, 1)), train=False)
        assert out.shape == (1, 257, 126, 1)
        out = model.apply(variables, jnp.zeros((1, 257, 33, 1)), train=False)
        assert out.shape == (1, 257, 33, 1)

    def test_residual_mask_identity_at_init(self):
        model = ComplexMaskUNet(
            s2d_stem=True, residual=True, zero_out_init=True,
            mask_bound=8.0, **TINY
        )
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 64, 32, 3)),
            jnp.float32,
        )
        variables = model.init(jax.random.key(0), x)
        mask = model.apply(variables, x, train=False)
        assert mask.shape == (2, 64, 32, 2)
        np.testing.assert_allclose(np.asarray(mask[..., 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mask[..., 1]), 0.0, atol=1e-6)

    def test_param_count_delta_vs_plain(self):
        # full-width: stem 3x3x(4-1)x64 = +1728, head (1x1x64x3 + 3) = +195
        plain = UNet()
        s2d = UNet(s2d_stem=True)
        pv = jax.eval_shape(
            lambda: plain.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        )
        sv = jax.eval_shape(
            lambda: s2d.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
        )

        def count(t):
            return sum(
                int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(t["params"])
            )

        assert count(sv) - count(pv) == 1728 + 195


class TestS2DFold:
    def test_fold_parity_including_odd_shape(self):
        rng = np.random.default_rng(2)
        model = UNet(s2d_stem=True, dtype=jnp.bfloat16, **TINY)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        # non-trivial BN stats so the fold is load-bearing
        variables = jax.tree_util.tree_map_with_path(
            lambda path, leaf: (
                jnp.asarray(
                    0.5 + np.abs(rng.standard_normal(np.asarray(leaf).shape)),
                    jnp.float32,
                )
                if "bn" in "/".join(
                    str(p.key) for p in path if hasattr(p, "key")
                )
                and str(path[-1].key) in ("var", "scale")
                else leaf
            ),
            variables,
        )
        folded_model, folded_vars = fold_runner_inputs(model, variables)
        assert folded_model.s2d_stem
        for shape in [(2, 64, 32, 1), (1, 257, 33, 1)]:
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            ref = model.apply(variables, x, train=False)
            got = folded_model.apply(folded_vars, x, train=False)
            assert got.shape == ref.shape
            assert _rel(got, ref) < 2e-2  # bf16 rounding


class TestS2DSidecar:
    def test_export_load_roundtrip(self, tmp_path):
        from audiodenoiser_tpu.eval.runner import load_model_from_path
        from audiodenoiser_tpu.train.checkpoints import export_model

        # width_mult 0.25 widths ARE sidecar-expressible — use them so the
        # loader rebuilds the exact architecture and the weights apply
        from audiodenoiser_tpu.models.unet import width_kwargs

        model = ComplexMaskUNet(
            s2d_stem=True, residual=True, mask_bound=8.0,
            **width_kwargs(0.25)
        )
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        path = os.path.join(tmp_path, "best_model_mixed.ckpt")
        export_model(path, variables["params"], variables["batch_stats"])
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump({"mask_bound": 8.0, "residual": True,
                       "s2d_stem": True, "width_mult": 0.25}, f)
        loaded, lv = load_model_from_path(path)
        assert loaded.s2d_stem
        x = jnp.zeros((1, 64, 32, 3), jnp.float32)
        out = loaded.apply(
            {"params": lv["params"], "batch_stats": lv["batch_stats"]},
            x, train=False,
        )
        assert out.shape == (1, 64, 32, 2)


class TestS2DSkip:
    """Full-resolution refinement path (``UNet(s2d_skip=K)``).

    The round-5 distillation study located the s2d tier's residual quality
    gap in the half-res pyramid itself (architecture-bound, not
    supervision-bound); ``s2d_skip`` adds a BN-free full-res Conv3x3->ReLU
    path concatenated with the sub-pixel head features and a final full-res
    Conv3x3. These pin shapes, the moved zero-init contract, fold parity,
    and the sidecar round-trip.
    """

    def test_shapes_and_param_layout(self):
        model = UNet(s2d_stem=True, s2d_skip=8, **TINY)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        p = variables["params"]
        # head emits 4*K channels for depth-to-space into K full-res feats
        assert p["out"]["kernel"].shape[-1] == 32
        # full-res path: 1 input channel -> K, then concat(K + K) -> out
        assert p["s2d_skip_conv"]["kernel"].shape == (3, 3, 1, 8)
        assert p["s2d_refine"]["kernel"].shape == (3, 3, 16, 1)
        out = model.apply(variables, jnp.zeros((2, 256, 64, 1)), train=False)
        assert out.shape == (2, 256, 64, 1)
        for shape in [(1, 257, 126, 1), (1, 257, 33, 1)]:
            out = model.apply(variables, jnp.zeros(shape), train=False)
            assert out.shape == shape

    def test_residual_mask_identity_at_init(self):
        # zero_out_init moves to the final refine conv: a fresh refined
        # s2d mask net must still be an exact pass-through
        model = ComplexMaskUNet(
            s2d_stem=True, s2d_skip=8, residual=True, zero_out_init=True,
            mask_bound=8.0, **TINY
        )
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 64, 32, 3)),
            jnp.float32,
        )
        variables = model.init(jax.random.key(0), x)
        # intermediate head conv is NOT zero-init (a zero head would also
        # zero the refine conv's input gradient to the whole pyramid)
        assert float(jnp.abs(variables["params"]["out"]["kernel"]).sum()) > 0
        assert float(
            jnp.abs(variables["params"]["s2d_refine"]["kernel"]).sum()
        ) == 0.0
        mask = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(mask[..., 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mask[..., 1]), 0.0, atol=1e-6)

    def test_fold_parity_including_odd_shape(self):
        rng = np.random.default_rng(4)
        model = UNet(s2d_stem=True, s2d_skip=8, dtype=jnp.bfloat16, **TINY)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
        variables = jax.tree_util.tree_map_with_path(
            lambda path, leaf: (
                jnp.asarray(
                    0.5 + np.abs(rng.standard_normal(np.asarray(leaf).shape)),
                    jnp.float32,
                )
                if "bn" in "/".join(
                    str(p.key) for p in path if hasattr(p, "key")
                )
                and str(path[-1].key) in ("var", "scale")
                else leaf
            ),
            variables,
        )
        folded_model, folded_vars = fold_runner_inputs(model, variables)
        assert folded_model.s2d_skip == 8
        for shape in [(2, 64, 32, 1), (1, 257, 33, 1)]:
            x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            ref = model.apply(variables, x, train=False)
            got = folded_model.apply(folded_vars, x, train=False)
            assert got.shape == ref.shape
            assert _rel(got, ref) < 2e-2  # bf16 rounding

    def test_export_load_roundtrip(self, tmp_path):
        from audiodenoiser_tpu.eval.runner import load_model_from_path
        from audiodenoiser_tpu.models.unet import width_kwargs
        from audiodenoiser_tpu.train.checkpoints import export_model

        model = ComplexMaskUNet(
            s2d_stem=True, s2d_skip=8, residual=True, mask_bound=8.0,
            **width_kwargs(0.25)
        )
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        path = os.path.join(tmp_path, "best_model_mixed.ckpt")
        export_model(path, variables["params"], variables["batch_stats"])
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump({"mask_bound": 8.0, "residual": True,
                       "s2d_stem": True, "s2d_skip": 8,
                       "width_mult": 0.25}, f)
        loaded, lv = load_model_from_path(path)
        assert loaded.s2d_stem and loaded.s2d_skip == 8
        out = loaded.apply(
            {"params": lv["params"], "batch_stats": lv["batch_stats"]},
            jnp.zeros((1, 64, 32, 3), jnp.float32), train=False,
        )
        assert out.shape == (1, 64, 32, 2)
