"""Noise-kernel invariants: SNR math, cancellation structure, reverb IR.

The reverb test re-simulates the JUCE CombFilter/AllPassFilter recurrences
sample by sample in pure Python (an independent implementation of
pedalboard's engine) and checks the library's scipy-lfilter IR against it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.dsp import noise


def _measured_snr_db(clean, noisy):
    n = noisy - clean
    return 20.0 * np.log10(np.sqrt(np.mean(clean**2)) / np.sqrt(np.mean(n**2)))


class TestSNRScale:
    def test_reference_arithmetic(self, rng):
        clean = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        n = (rng.standard_normal(16000) * 0.7).astype(np.float32)
        scaled = np.asarray(noise.snr_scale(jnp.asarray(clean), jnp.asarray(n), 8.0))
        # exact port of create_train_dataset.py:148-153
        clean_rms = np.sqrt(np.mean(clean**2) + 1e-12)
        noise_rms = np.sqrt(np.mean(n**2) + 1e-12)
        expect = n * ((clean_rms / 10 ** (8.0 / 20.0)) / noise_rms)
        np.testing.assert_allclose(scaled, expect, atol=1e-6)

    def test_silent_noise_guard(self):
        clean = jnp.ones(100) * 0.5
        out = np.asarray(noise.snr_scale(clean, jnp.zeros(100)))
        np.testing.assert_array_equal(out, 0.0)

    def test_batched_per_example_rms(self, rng):
        clean = rng.standard_normal((4, 16000)).astype(np.float32) * np.array(
            [[0.01], [0.1], [0.5], [0.9]], np.float32
        )
        n = rng.standard_normal((4, 16000)).astype(np.float32)
        scaled = np.asarray(noise.snr_scale(jnp.asarray(clean), jnp.asarray(n)))
        for i in range(4):
            snr = 20 * np.log10(
                np.sqrt(np.mean(clean[i] ** 2)) / np.sqrt(np.mean(scaled[i] ** 2))
            )
            assert abs(snr - 8.0) < 0.05


class TestWhite:
    def test_snr_is_8db(self, rng):
        clean = (rng.standard_normal(16000) * 0.2).astype(np.float32)
        noisy = np.asarray(noise.white(jax.random.key(0), jnp.asarray(clean)))
        assert abs(_measured_snr_db(clean, noisy) - 8.0) < 0.2
        assert noisy.min() >= -1.0 and noisy.max() <= 1.0


class TestUrban:
    def test_tiling_short_noise(self, rng):
        clean = (rng.standard_normal(16000) * 0.2).astype(np.float32)
        clip = (rng.standard_normal(3000) * 0.5).astype(np.float32)
        noisy = np.asarray(
            noise.urban(jax.random.key(0), jnp.asarray(clean), jnp.asarray(clip))
        )
        assert abs(_measured_snr_db(clean, noisy) - 8.0) < 0.2
        # tiling: the injected noise repeats with period 3000
        inj = noisy - clean
        np.testing.assert_allclose(inj[:3000], inj[3000:6000], atol=1e-4)

    def test_snippet_long_noise(self, rng):
        clean = (rng.standard_normal(4000) * 0.2).astype(np.float32)
        clip = (rng.standard_normal(50000) * 0.5).astype(np.float32)
        noisy = np.asarray(
            noise.urban(jax.random.key(1), jnp.asarray(clean), jnp.asarray(clip))
        )
        assert abs(_measured_snr_db(clean, noisy) - 8.0) < 0.3

    def test_match_length_exact(self, rng):
        clip = jnp.asarray(rng.standard_normal(5000).astype(np.float32))
        out = noise.match_length(jax.random.key(0), clip, 5000)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(clip))


class TestNoiseCancellation:
    def test_structure_single_block(self, rng):
        clean = np.clip(rng.standard_normal(16000) * 0.3, -1, 1).astype(np.float32)
        hits = 0
        for seed in range(40):
            noisy = np.asarray(
                noise.noise_cancellation(jax.random.key(seed), jnp.asarray(clean))
            )
            # second half must always be untouched
            np.testing.assert_allclose(noisy[8000:], clean[8000:], atol=1e-7)
            if not np.allclose(noisy[:8000], clean[:8000]):
                np.testing.assert_allclose(noisy[:8000], 0.2 * clean[:8000], atol=1e-6)
                hits += 1
        assert 20 <= hits <= 40  # p = 0.8

    def test_multi_block(self, rng):
        clean = np.clip(rng.standard_normal(40000) * 0.3, -1, 1).astype(np.float32)
        noisy = np.asarray(
            noise.noise_cancellation(jax.random.key(3), jnp.asarray(clean))
        )
        for b in range(3):
            seg = slice(b * 16000, b * 16000 + 8000)
            keep = slice(b * 16000 + 8000, min((b + 1) * 16000, 40000))
            np.testing.assert_allclose(noisy[keep], clean[keep], atol=1e-7)
            assert np.allclose(noisy[seg], clean[seg]) or np.allclose(
                noisy[seg], 0.2 * clean[seg], atol=1e-6
            )


def _juce_reverb_sim(x, sr, room_size, damping, wet_level, dry_level=0.4, width=1.0):
    """Sample-by-sample simulation of juce::Reverb::processMono."""
    feedback = room_size * 0.28 + 0.7
    damp = damping * 0.4
    wet1 = 0.5 * (wet_level * 3.0) * (1.0 + width)
    dry = dry_level * 2.0
    comb_sizes = [sr * t // 44100 for t in (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)]
    ap_sizes = [sr * t // 44100 for t in (556, 441, 341, 225)]
    combs = [{"buf": np.zeros(s), "i": 0, "last": 0.0} for s in comb_sizes]
    aps = [{"buf": np.zeros(s), "i": 0} for s in ap_sizes]
    out = np.zeros_like(x)
    for n in range(len(x)):
        inp = x[n] * 0.015
        acc = 0.0
        for c in combs:
            o = c["buf"][c["i"]]
            c["last"] = o * (1.0 - damp) + c["last"] * damp
            c["buf"][c["i"]] = inp + c["last"] * feedback
            c["i"] = (c["i"] + 1) % len(c["buf"])
            acc += o
        for a in aps:
            buffered = a["buf"][a["i"]]
            a["buf"][a["i"]] = acc + buffered * 0.5
            a["i"] = (a["i"] + 1) % len(a["buf"])
            acc = buffered - acc
        out[n] = acc * wet1 + x[n] * dry
    return out


class TestReverb:
    def test_ir_matches_juce_simulation(self):
        n = 3000
        impulse = np.zeros(n, dtype=np.float64)
        impulse[0] = 1.0
        sim = _juce_reverb_sim(impulse, 8000, 0.9, 0.9, 0.33, dry_level=0.0)
        ir = noise.reverb_impulse_response(8000, n, 0.9, 0.9, 0.33)
        np.testing.assert_allclose(ir, sim, atol=1e-5)

    def test_full_reverb_matches_juce_simulation(self, rng):
        x = (rng.standard_normal(2000) * 0.1).astype(np.float32)
        sim = _juce_reverb_sim(x.astype(np.float64), 8000, 0.9, 0.9, 0.33)
        ours = np.asarray(noise.reverb(jnp.asarray(x), 8000))
        np.testing.assert_allclose(ours, np.clip(sim, -1, 1), atol=1e-4)

    def test_energy_tail_decays(self):
        impulse = np.zeros(16000, dtype=np.float32)
        impulse[0] = 1.0
        ir = noise.reverb_impulse_response(8000, 16000, 0.9, 0.9, 0.33)
        early = np.sum(ir[:4000] ** 2)
        late = np.sum(ir[12000:] ** 2)
        assert late < early  # decaying tail
        assert np.abs(ir[8000:]).max() > 0  # but a long one (room_size=0.9)


class TestDispatch:
    def test_add_noise_all_types(self, rng):
        clean = jnp.asarray((rng.standard_normal(16000) * 0.2).astype(np.float32))
        clip = jnp.asarray((rng.standard_normal(9000) * 0.4).astype(np.float32))
        for nt in ("white", "urban", "reverb", "noise_cancellation"):
            out = noise.add_noise(jax.random.key(0), clean, nt, noise_clip=clip)
            assert out.shape == clean.shape
            arr = np.asarray(out)
            assert arr.min() >= -1.0 and arr.max() <= 1.0

    def test_urban_empty_clip_zeros(self, rng):
        clean = jnp.asarray((rng.standard_normal(1000) * 0.2).astype(np.float32))
        out = noise.add_noise(jax.random.key(0), clean, "urban", noise_clip=None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(clean), atol=1e-7)
