"""MultiStreamWola: N concurrent streams advanced in one dispatch.

Per-stream semantics must match a dedicated StreamingSession exactly —
same window math, same silent lead-in — with uneven per-slot progress
handled by masking, and slot lifecycle (open/close/reuse) isolated.
"""

import jax
import numpy as np
import pytest

from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.eval.streaming import MultiStreamWola, StreamingDenoiser
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train import create_train_state

CHUNK = 2048
HOP = CHUNK // 2


@pytest.fixture(scope="module")
def tiny_runner():
    model = UNet(features=(4, 8), bottleneck=16)
    state = create_train_state(
        jax.random.key(0), model, input_shape=(1, 32, 32, 1)
    )
    return DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )


def _single_reference(runner, signal, packet):
    sess = StreamingDenoiser(runner, chunk_samples=CHUNK).session()
    outs = [
        sess.process(signal[i: i + packet])
        for i in range(0, len(signal), packet)
    ]
    return np.concatenate(outs)


def _signals(n, length, seed=0):
    rng = np.random.default_rng(seed)
    return [
        np.clip(rng.standard_normal(length) * 0.2, -1, 1).astype(np.float32)
        for _ in range(n)
    ]


class TestParityWithSingleSessions:
    def test_two_streams_match_dedicated_sessions(self, tiny_runner):
        sigs = _signals(2, 4 * CHUNK)
        pool = MultiStreamWola(tiny_runner, capacity=3, chunk_samples=CHUNK)
        slots = [pool.open(), pool.open()]
        got = {s: [] for s in slots}
        for i in range(0, len(sigs[0]), HOP):
            out = pool.process(
                {s: sig[i: i + HOP] for s, sig in zip(slots, sigs)}
            )
            for s in slots:
                got[s].append(out[s])
        for s, sig in zip(slots, sigs):
            ref = _single_reference(tiny_runner, sig, HOP)
            np.testing.assert_allclose(
                np.concatenate(got[s]), ref, rtol=0, atol=1e-5
            )

    def test_uneven_packet_rates_masked_progress(self, tiny_runner):
        """Slot A feeds 2 hops per call, slot B feeds 1: B's state must
        advance only by its own staged hops."""
        sigs = _signals(2, 4 * CHUNK, seed=1)
        pool = MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        a, b = pool.open(), pool.open()
        got_a, got_b = [], []
        ia = ib = 0
        while ia < len(sigs[0]):
            out = pool.process(
                {a: sigs[0][ia: ia + 2 * HOP], b: sigs[1][ib: ib + HOP]}
            )
            got_a.append(out[a])
            got_b.append(out[b])
            ia += 2 * HOP
            ib += HOP
        # drain B's remaining half
        while ib < len(sigs[1]):
            out = pool.process({b: sigs[1][ib: ib + HOP]})
            got_b.append(out[b])
            ib += HOP
        np.testing.assert_allclose(
            np.concatenate(got_a),
            _single_reference(tiny_runner, sigs[0], 2 * HOP),
            rtol=0, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.concatenate(got_b),
            _single_reference(tiny_runner, sigs[1], HOP),
            rtol=0, atol=1e-5,
        )

    def test_mid_stream_join_is_isolated(self, tiny_runner):
        """A stream opened after the pool has been running gets a fresh
        lead-in and matches a dedicated session bit-for-bit."""
        sigs = _signals(2, 2 * CHUNK, seed=2)
        pool = MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        a = pool.open()
        pool.process({a: sigs[0][:CHUNK]})
        b = pool.open()
        got_b = [
            pool.process({b: sigs[1][i: i + HOP]})[b]
            for i in range(0, len(sigs[1]), HOP)
        ]
        np.testing.assert_allclose(
            np.concatenate(got_b),
            _single_reference(tiny_runner, sigs[1], HOP),
            rtol=0, atol=1e-5,
        )

    def test_slot_reuse_after_close_resets_state(self, tiny_runner):
        sig = _signals(1, 2 * CHUNK, seed=3)[0]
        pool = MultiStreamWola(tiny_runner, capacity=1, chunk_samples=CHUNK)
        a = pool.open()
        pool.process({a: sig})
        pool.close(a)
        b = pool.open()
        assert b == a  # capacity-1 pool reuses the slot
        got = [
            pool.process({b: sig[i: i + HOP]})[b]
            for i in range(0, len(sig), HOP)
        ]
        np.testing.assert_allclose(
            np.concatenate(got),
            _single_reference(tiny_runner, sig, HOP),
            rtol=0, atol=1e-5,
        )


class TestLifecycle:
    def test_capacity_enforced(self, tiny_runner):
        pool = MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        pool.open(), pool.open()
        with pytest.raises(IndexError):
            pool.open()

    def test_process_rejects_unopened_slot(self, tiny_runner):
        pool = MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        with pytest.raises(KeyError):
            pool.process({0: np.zeros(HOP, np.float32)})

    def test_double_close_is_idempotent(self, tiny_runner):
        pool = MultiStreamWola(tiny_runner, capacity=1, chunk_samples=CHUNK)
        a = pool.open()
        pool.close(a)
        pool.close(a)
        assert pool.open() == a

    @pytest.mark.parametrize("n", [4 * CHUNK, CHUNK + HOP // 2, HOP - 3])
    def test_flush_is_sample_exact(self, tiny_runner, n):
        """A flushed slot emits EXACTLY as many samples as were staged —
        the contract HTTP stream clients count on (the round-4 production
        soak failed on a +hop surplus per stream before this was pinned)."""
        sig = _signals(1, n, seed=9)[0]
        pool = MultiStreamWola(tiny_runner, capacity=1, chunk_samples=CHUNK)
        a = pool.open()
        got = [pool.process({a: sig})[a], pool.flush(a)]
        assert len(np.concatenate(got)) == n
        assert len(pool.flush(a)) == 0  # nothing left

    def test_pooled_session_flush_is_sample_exact(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import PooledStreamSessions

        pool = PooledStreamSessions(
            MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        )
        n = 3 * CHUNK + 100
        sig = _signals(1, n, seed=11)[0]
        sess = pool.session()
        pieces = [sess.process(sig[i: i + HOP])
                  for i in range(0, n, HOP)]
        pieces.append(sess.flush())
        assert len(np.concatenate(pieces)) == n

    def test_flush_is_terminal_per_slot(self, tiny_runner):
        """A flushed slot's WOLA state holds flush-pad decay — further
        stage() must raise (reopen via close()+open()), and a second
        flush returns empty."""
        pool = MultiStreamWola(tiny_runner, capacity=1, chunk_samples=CHUNK)
        a = pool.open()
        pool.process({a: _signals(1, CHUNK, seed=5)[0]})
        pool.flush(a)
        assert len(pool.flush(a)) == 0
        with pytest.raises(RuntimeError, match="flushed"):
            pool.stage(a, np.zeros(HOP, np.float32))
        pool.close(a)
        b = pool.open()
        assert b == a  # reopened slot is usable again
        out = pool.process({b: _signals(1, CHUNK, seed=6)[0]})
        assert np.all(np.isfinite(out[b]))

    def test_flush_does_not_consume_other_slots(self, tiny_runner):
        """flush(A) must advance ONLY slot A: slot B's staged-but-unrun
        hops stay staged (a pool-wide advance would emit B's audio into a
        dict flush() throws away — unrecoverable data loss). B's total
        stream must still match a dedicated single session."""
        sigs = _signals(2, 2 * CHUNK, seed=7)
        pool = MultiStreamWola(tiny_runner, capacity=2, chunk_samples=CHUNK)
        a, b = pool.open(), pool.open()
        out = pool.process({a: sigs[0][:CHUNK], b: sigs[1][:CHUNK]})
        got_a = [out[a], ]
        got_b = [out[b], ]
        # stage a full hop on B, then flush A without running B's backlog
        pool.stage(b, sigs[1][CHUNK: CHUNK + HOP])
        got_a.append(pool.flush(a))
        assert len(np.concatenate(got_a)) == CHUNK  # A is sample-exact
        # B continues: drain the rest and flush — nothing was lost
        got_b.append(pool.process({b: sigs[1][CHUNK + HOP:]})[b])
        got_b.append(pool.flush(b))
        y_b = np.concatenate(got_b)
        assert len(y_b) == len(sigs[1])  # B is still sample-exact
        ref_sess = StreamingDenoiser(tiny_runner, chunk_samples=CHUNK).session()
        ref = np.concatenate([ref_sess.process(sigs[1]), ref_sess.flush()])
        np.testing.assert_allclose(y_b, ref, rtol=0, atol=1e-5)

    def test_flush_emits_tail(self, tiny_runner):
        sig = _signals(1, CHUNK + HOP // 2, seed=4)[0]
        pool = MultiStreamWola(tiny_runner, capacity=1, chunk_samples=CHUNK)
        a = pool.open()
        first = pool.process({a: sig})[a]
        tail = pool.flush(a)
        sess = StreamingDenoiser(
            tiny_runner, chunk_samples=CHUNK
        ).session()
        ref = np.concatenate([sess.process(sig), sess.flush()])
        got = np.concatenate([first, tail])
        np.testing.assert_allclose(
            got, ref[: len(got)], rtol=0, atol=1e-5
        )


class TestAutoPoolCapacity:
    """auto_pool_capacity sizes the pool from XLA's memory analysis."""

    def test_capacity_scales_with_budget(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import auto_pool_capacity

        small = auto_pool_capacity(
            tiny_runner, chunk_samples=CHUNK, hbm_bytes=1 << 20
        )
        big = auto_pool_capacity(
            tiny_runner, chunk_samples=CHUNK, hbm_bytes=1 << 28
        )
        assert isinstance(small, int) and isinstance(big, int)
        assert 1 <= small <= big <= 256

    def test_max_capacity_clamps(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import auto_pool_capacity

        got = auto_pool_capacity(
            tiny_runner,
            chunk_samples=CHUNK,
            hbm_bytes=1 << 40,
            max_capacity=16,
        )
        assert got == 16

    def test_tiny_budget_floors_at_one(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import auto_pool_capacity

        assert (
            auto_pool_capacity(tiny_runner, chunk_samples=CHUNK, hbm_bytes=1)
            == 1
        )

    def test_bad_safety_rejected(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import auto_pool_capacity

        with pytest.raises(ValueError):
            auto_pool_capacity(
                tiny_runner, chunk_samples=CHUNK, safety=0.0
            )

    def test_sized_pool_is_usable(self, tiny_runner):
        from audiodenoiser_tpu.eval.streaming import auto_pool_capacity

        cap = auto_pool_capacity(
            tiny_runner,
            chunk_samples=CHUNK,
            hbm_bytes=1 << 26,
            max_capacity=4,
        )
        pool = MultiStreamWola(tiny_runner, capacity=cap, chunk_samples=CHUNK)
        slot = pool.open()
        out = pool.process({slot: _signals(1, CHUNK, seed=9)[0]})
        assert out[slot].shape[0] > 0
