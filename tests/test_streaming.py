"""Streaming WOLA denoiser: COLA identity, offline/online equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.eval.streaming import StreamingDenoiser
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train import create_train_state


class _IdentityNet(UNet):
    def __call__(self, x, train=False):
        return x


@pytest.fixture(scope="module")
def identity_streamer():
    runner = DenoiserRunner(_IdentityNet(), {})
    return StreamingDenoiser(runner, chunk_samples=2048)


@pytest.fixture(scope="module")
def tiny_streamer():
    model = UNet(features=(4, 8), bottleneck=16)
    state = create_train_state(jax.random.key(0), model, input_shape=(1, 32, 32, 1))
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    return StreamingDenoiser(runner, chunk_samples=2048)


class TestOffline:
    def test_identity_network_reconstructs_input(self, identity_streamer, rng):
        """COLA check: with a bypass net, streaming must reproduce the input."""
        x = np.clip(rng.standard_normal(10000) * 0.2, -1, 1).astype(np.float32)
        y = identity_streamer.denoise(x)
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=2e-3)

    def test_real_network_runs(self, tiny_streamer, rng):
        x = np.clip(rng.standard_normal(6000) * 0.2, -1, 1).astype(np.float32)
        y = tiny_streamer.denoise(x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(y))

    def test_odd_chunk_rejected(self):
        with pytest.raises(ValueError):
            StreamingDenoiser(DenoiserRunner(_IdentityNet(), {}), chunk_samples=999)


class TestOnline:
    def test_session_matches_offline(self, identity_streamer, rng):
        x = np.clip(rng.standard_normal(9000) * 0.2, -1, 1).astype(np.float32)
        sess = identity_streamer.session()
        pieces = []
        # push in awkward unequal packets
        for piece in np.array_split(x, 13):
            pieces.append(sess.process(piece))
        pieces.append(sess.flush())
        pieces.append(sess.flush())
        y = np.concatenate(pieces)
        assert len(y) >= len(x)
        np.testing.assert_allclose(y[: len(x)], x, atol=2e-3)

    def test_latency_budget(self, identity_streamer):
        sess = identity_streamer.session()
        assert sess.latency_samples == 2048
        # nothing emitted before one full chunk+hop of input is available
        out = sess.process(np.zeros(identity_streamer.chunk - 1, np.float32))
        assert len(out) == 0

    def test_multi_hop_packet_is_one_device_step(self, identity_streamer, rng):
        """A process() call with k completed hops runs ONE compiled multi-hop
        scan (device-resident WOLA state), not k host round-trips."""
        sd = identity_streamer
        sess = sd.session()
        calls = []
        orig = sd._session_steps

        def counting(state, hops):
            calls.append(hops.shape)
            return orig(state, hops)

        sess.p = type(sd)(sd.runner, sd.chunk, sd.sample_rate)
        sess.p._session_steps = counting
        x = np.clip(rng.standard_normal(4 * sd.hop) * 0.2, -1, 1).astype(np.float32)
        out = sess.process(x)
        assert calls == [(4, sd.hop)]
        assert len(out) == 3 * sd.hop  # 4 hops finalized minus the lead-in

    def test_emission_rate(self, identity_streamer, rng):
        """After priming, each hop of input yields a hop of output."""
        sess = identity_streamer.session()
        hop = identity_streamer.hop
        sess.process(np.zeros(identity_streamer.chunk, np.float32))
        for _ in range(5):
            out = sess.process(np.zeros(hop, np.float32))
            assert len(out) == hop
