"""Pipeline-parallel (stage-split) U-Net tests on the virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.parallel.pipeline import (
    PipelinedDenoiser,
    make_stages,
    split_variables,
)

SMALL = dict(features=(8, 16, 32, 64), bottleneck=128)


@pytest.fixture(scope="module")
def small_unet():
    model = UNet(dtype=jnp.float32, **SMALL)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 1), jnp.float32))
    )(jax.random.key(0))
    return model, variables


def test_stage_split_covers_all_blocks():
    for n in (1, 2, 4, 8, 10):
        stages = make_stages(n, **SMALL)
        assert len(stages) == n
        names = []
        for s in stages:
            names += [nm for nm, _ in s.downs]
            if s.bottleneck is not None:
                names.append("bottleneck")
            names += [nm for nm, _ in s.ups]
            if s.out_channels is not None:
                names.append("out")
        assert names == [
            "down0", "down1", "down2", "down3", "bottleneck",
            "up0", "up1", "up2", "up3", "out",
        ]


def test_split_variables_partitions_params(small_unet):
    _, variables = small_unet
    stages = make_stages(4, **SMALL)
    parts = split_variables(variables, stages)
    all_keys = [k for p in parts for k in p["params"]]
    assert sorted(all_keys) == sorted(variables["params"].keys())


@pytest.mark.parametrize("n_stages,microbatches", [(2, 1), (4, 2), (8, 3)])
def test_pipelined_matches_monolithic(small_unet, rng, n_stages, microbatches):
    model, variables = small_unet
    x = jnp.asarray(np.abs(rng.standard_normal((5, 64, 48, 1))), jnp.float32)
    want = np.asarray(model.apply(variables, x, train=False))
    pipe = PipelinedDenoiser(
        variables, devices=jax.devices()[:n_stages], **SMALL
    )
    got = np.asarray(pipe(x, microbatches=microbatches))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pipelined_odd_eval_shape(small_unet, rng):
    """The whole-clip eval shape (F=257, odd T) must survive stage-split
    padding exactly like the monolithic forward."""
    model, variables = small_unet
    x = jnp.asarray(np.abs(rng.standard_normal((2, 257, 50, 1))), jnp.float32)
    want = np.asarray(model.apply(variables, x, train=False))
    pipe = PipelinedDenoiser(variables, devices=jax.devices()[:4], **SMALL)
    got = np.asarray(pipe(x, microbatches=2))
    np.testing.assert_allclose(got, want, atol=1e-5)
