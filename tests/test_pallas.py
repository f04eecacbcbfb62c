"""Pallas kernel parity (interpret mode on CPU; compiled path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiodenoiser_tpu.dsp.stft as S
from audiodenoiser_tpu.dsp.window import hann_window
from audiodenoiser_tpu.ops.pallas import overlap_add_pallas, stft_pallas


class TestStftKernel:
    def test_matches_fft_path_batched(self, rng):
        x = rng.standard_normal((3, 16000)).astype(np.float32)
        w = hann_window(512)
        re, im = stft_pallas(jnp.asarray(x), jnp.asarray(w), 512, 128, interpret=True)
        ref = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=False))
        assert re.shape == im.shape == ref.shape == (3, 257, 122)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=5e-3)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=5e-3)

    def test_via_stft_precision_flag(self, rng):
        x = rng.standard_normal((2, 8000)).astype(np.float32)
        a = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=True, precision="pallas"))
        b = np.asarray(S.stft(jnp.asarray(x), 512, 128, center=True))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_rectangular_window(self, rng):
        x = rng.standard_normal((2, 2048)).astype(np.float32)
        w = np.ones(512, np.float32)
        re, im = stft_pallas(jnp.asarray(x), jnp.asarray(w), 512, 128, interpret=True)
        ref = np.asarray(
            S.stft(jnp.asarray(x), 512, 128, window="ones", center=False)
        )
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=5e-3)

    def test_rejects_unbatched(self):
        with pytest.raises(ValueError):
            stft_pallas(jnp.zeros(4000), jnp.zeros(512), interpret=True)


class TestOverlapAddKernel:
    def test_matches_xla_overlap_add(self, rng):
        frames = rng.standard_normal((4, 10, 512)).astype(np.float32)
        ours = np.asarray(overlap_add_pallas(jnp.asarray(frames), 128, interpret=True))
        ref = np.asarray(S.overlap_add(jnp.asarray(frames), 128))
        assert ours.shape == ref.shape == (4, 9 * 128 + 512)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_non_divisible_hop(self, rng):
        frames = rng.standard_normal((2, 6, 512)).astype(np.float32)
        ours = np.asarray(overlap_add_pallas(jnp.asarray(frames), 100, interpret=True))
        ref = np.asarray(S.overlap_add(jnp.asarray(frames), 100))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rejects_unbatched(self):
        with pytest.raises(ValueError):
            overlap_add_pallas(jnp.zeros((10, 512)), 128, interpret=True)


class TestIstftKernel:
    def test_matches_irfft_ola(self, rng):
        spec = (rng.standard_normal((3, 257, 20)) +
                1j * rng.standard_normal((3, 257, 20))).astype(np.complex64)
        from audiodenoiser_tpu.ops.pallas import istft_pallas

        w = hann_window(512)
        ours = np.asarray(
            istft_pallas(
                jnp.asarray(spec.real), jnp.asarray(spec.imag),
                jnp.asarray(w), 512, 128, interpret=True,
            )
        )
        frames = np.fft.irfft(np.swapaxes(spec, -1, -2), n=512, axis=-1) * w
        ref = np.asarray(S.overlap_add(jnp.asarray(frames.astype(np.float32)), 128))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_full_istft_pallas_path_roundtrip(self, rng):
        x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.2
        spec = S.stft(jnp.asarray(x), 512, 128, center=True)
        a = np.asarray(S.istft(spec, 128, precision="pallas"))
        b = np.asarray(S.istft(spec, 128))
        np.testing.assert_allclose(a, b, atol=1e-4)
        np.testing.assert_allclose(a, x[:, : a.shape[-1]], atol=1e-3)

    def test_long_clip_chunked_ola(self, rng):
        """T-chunked inverse kernel: a long clip (many T_CHUNK sweeps with
        spill carry, incl. a ragged final chunk) still matches irfft+OLA —
        the unchunked version overflowed VMEM past ~8 s clips."""
        x = rng.standard_normal((1, 80000)).astype(np.float32) * 0.2  # 10 s
        spec = S.stft(jnp.asarray(x), 512, 128, center=True)
        a = np.asarray(S.istft(spec, 128, precision="pallas", length=80000))
        b = np.asarray(S.istft(spec, 128, length=80000))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_odd_nfft_rejected_dim(self):
        from audiodenoiser_tpu.ops.pallas import istft_pallas

        with pytest.raises(ValueError):
            istft_pallas(jnp.zeros((1, 100, 4)), jnp.zeros((1, 100, 4)),
                         jnp.zeros(512), 512, 128, interpret=True)


class TestDeconvKernel:
    """conv_transpose_2x2 vs flax nn.ConvTranspose (the XLA lowering)."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(7)

    @pytest.mark.parametrize(
        "shape",
        [
            (3, 16, 4, 64, 32),   # bottleneck-like: tall channels, tiny W
            (2, 8, 7, 32, 16),    # odd W (the 257x126 eval shapes)
            (1, 4, 63, 16, 8),    # wide odd W, batch 1
            (9, 16, 4, 128, 64),  # batch not a multiple of the tile
        ],
    )
    def test_matches_flax(self, rng, shape):
        import flax.linen as nn

        from audiodenoiser_tpu.ops.pallas import conv_transpose_2x2

        b, h, w, cin, cout = shape
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.1,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        mod = nn.ConvTranspose(cout, kernel_size=(2, 2), strides=(2, 2),
                               padding="VALID")
        ref = mod.apply({"params": {"kernel": k, "bias": bias}}, x)
        ours = conv_transpose_2x2(x, k, bias, True)
        assert ours.shape == (b, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_custom_vjp_matches_autodiff(self, rng):
        import flax.linen as nn

        from audiodenoiser_tpu.ops.pallas import conv_transpose_2x2

        x = jnp.asarray(rng.standard_normal((2, 8, 4, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, 2, 16, 8)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
        mod = nn.ConvTranspose(8, kernel_size=(2, 2), strides=(2, 2),
                               padding="VALID")

        def f_ref(x, k, b):
            return jnp.sum(
                jnp.sin(mod.apply({"params": {"kernel": k, "bias": b}}, x))
            )

        def f_ours(x, k, b):
            return jnp.sum(jnp.sin(conv_transpose_2x2(x, k, b, True)))

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, k, bias)
        g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(x, k, bias)
        for a, b_ in zip(g_ref, g_ours):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4)

    def test_unet_forward_identical(self, rng):
        """pallas_deconv=True is a pure lowering change: same params, same
        outputs (incl. odd intermediate W from the eval shapes)."""
        from audiodenoiser_tpu.models import UNet

        xla = UNet(features=(8, 16, 24, 32), bottleneck=48)
        pal = UNet(features=(8, 16, 24, 32), bottleneck=48,
                   pallas_deconv=True)
        x = jnp.asarray(rng.standard_normal((1, 32, 48, 1)), jnp.float32)
        variables = xla.init(jax.random.key(0), x)
        a = xla.apply(variables, x, train=False)
        b = pal.apply(variables, x, train=False)
        assert jax.tree_util.tree_structure(
            pal.init(jax.random.key(0), x)
        ) == jax.tree_util.tree_structure(variables)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_bad_kernel_shape_rejected(self):
        from audiodenoiser_tpu.ops.pallas import conv_transpose_2x2

        with pytest.raises(ValueError):
            conv_transpose_2x2(jnp.zeros((1, 4, 4, 8)),
                               jnp.zeros((3, 3, 8, 4)), jnp.zeros(4), True)

    def test_module_pallas_path_wide(self, rng):
        """PallasConvTranspose2x2 at features>=128 (the kernel path; under
        128 the module falls back to the XLA lowering) matches flax."""
        import flax.linen as nn

        from audiodenoiser_tpu.models.unet import PallasConvTranspose2x2

        x = jnp.asarray(rng.standard_normal((2, 8, 4, 64)), jnp.float32)
        mod_p = PallasConvTranspose2x2(128)
        mod_x = nn.ConvTranspose(128, kernel_size=(2, 2), strides=(2, 2),
                                 padding="VALID")
        v = mod_p.init(jax.random.key(3), x)
        a = mod_p.apply(v, x)
        b = mod_x.apply(v, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
