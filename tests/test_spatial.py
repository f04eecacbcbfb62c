"""Sequence-parallel (time-sharded) long-clip inference tests.

Runs on the virtual 8-device CPU mesh (conftest). The exactness property:
overlap-tile with a receptive-field halo equals the unsharded forward of
the halo-padded clip, cropped (parallel/spatial.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.parallel.spatial import (
    RECEPTIVE_RADIUS,
    denoise_spec_sharded,
    denoise_waveform_sharded,
    make_seq_mesh,
    reference_padded_forward,
)

# full depth (the receptive-field and pool-alignment math is depth-driven),
# thin widths to keep the CPU forwards cheap
SMALL = dict(features=(8, 16, 32, 64), bottleneck=128)


@pytest.fixture(scope="module")
def small_model():
    model = UNet(dtype=jnp.float32, **SMALL)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 1), jnp.float32))
    )(jax.random.key(0))
    return model, variables


def test_receptive_radius_constant():
    # 2 frames/side per DoubleConv at its scale: encoder 2*(1+2+4+8),
    # bottleneck 2*16, decoder 2*(8+4+2+1)
    assert RECEPTIVE_RADIUS == 2 * (1 + 2 + 4 + 8) + 2 * 16 + 2 * (8 + 4 + 2 + 1)


def test_sharded_matches_padded_oracle(small_model, rng):
    model, variables = small_model
    mesh = make_seq_mesh(8)
    spec = jnp.asarray(np.abs(rng.standard_normal((257, 177))), jnp.float32)
    got = denoise_spec_sharded(model, variables, spec, mesh, halo=96)
    want = reference_padded_forward(model, variables, spec, halo=96)
    assert got.shape == spec.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_interior_matches_unsharded_forward(small_model, rng):
    """Away from the clip edges the sharded result also matches a plain
    unpadded forward — zero halos only perturb the first/last halo frames."""
    model, variables = small_model
    mesh = make_seq_mesh(8)
    t = 256  # 16-aligned so the plain forward needs no internal padding
    spec = jnp.asarray(np.abs(rng.standard_normal((257, t))), jnp.float32)
    got = denoise_spec_sharded(model, variables, spec, mesh, halo=96)
    plain = model.apply(
        variables, spec[jnp.newaxis, :, :, jnp.newaxis], train=False
    )[0, :, :, 0]
    lo, hi = RECEPTIVE_RADIUS, t - RECEPTIVE_RADIUS
    np.testing.assert_allclose(
        np.asarray(got)[:, lo:hi], np.asarray(plain)[:, lo:hi], atol=2e-4
    )


def test_waveform_long_clip_roundtrip(small_model, rng):
    """Waveform-in/out: STFT -> time-sharded U-Net -> noisy-phase iSTFT."""
    model, variables = small_model
    mesh = make_seq_mesh(8)
    wav = jnp.asarray(rng.standard_normal(4 * 8000) * 0.1, jnp.float32)
    out = denoise_waveform_sharded(model, variables, wav, mesh, halo=32)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()


def test_waveform_sharded_matches_runner_interior(small_model, rng):
    """The sp waveform path must agree with DenoiserRunner's noisy-phase
    graph away from the clip edges (edges see the halo zero padding)."""
    from audiodenoiser_tpu.eval.runner import DenoiserRunner

    model, variables = small_model
    mesh = make_seq_mesh(8)
    wav = jnp.asarray(rng.standard_normal(4 * 8000) * 0.1, jnp.float32)
    got = np.asarray(
        denoise_waveform_sharded(model, variables, wav, mesh, halo=96)
    )
    runner = DenoiserRunner(model, variables)
    want = np.asarray(
        runner.denoise_audio(wav[None], jax.random.key(0), mode="noisy_phase")
    )[0]
    # interior: skip RECEPTIVE_RADIUS frames of hop-128 audio on each side
    lo = (RECEPTIVE_RADIUS + 8) * 128
    assert len(got) - 2 * lo > 4000, "interior slice must be non-trivial"
    np.testing.assert_allclose(got[lo:-lo], want[lo:-lo], atol=2e-4)


def test_batched_nhwc_and_uneven_length(small_model, rng):
    model, variables = small_model
    mesh = make_seq_mesh(8)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 64, 100, 1))), jnp.float32)
    out = denoise_spec_sharded(model, variables, x, mesh, halo=16)
    assert out.shape == x.shape and out.dtype == x.dtype
    assert np.isfinite(np.asarray(out)).all()
