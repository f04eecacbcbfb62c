"""HTTP serving runtime: health, denoise round-trip, error paths."""

import io
import json
import threading
import time
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.serve import DenoiseService, make_http_server
from audiodenoiser_tpu.train import create_train_state


@pytest.fixture(scope="module")
def server_url():
    model = UNet(features=(4, 8), bottleneck=16)
    state = create_train_state(jax.random.key(0), model, input_shape=(1, 32, 32, 1))
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    service = DenoiseService(runner, bucket_samples=8000, max_seconds=10.0)
    server = make_http_server(service, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _wav_bytes(audio, sr=8000):
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, np.clip(audio * 32768, -32768, 32767).astype(np.int16))
    return buf.getvalue()


class TestServe:
    def test_healthz(self, server_url):
        with urllib.request.urlopen(f"{server_url}/healthz") as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["sample_rate"] == 8000

    def test_denoise_roundtrip(self, server_url, rng):
        audio = np.clip(rng.standard_normal(6000) * 0.2, -1, 1).astype(np.float32)
        req = urllib.request.Request(
            f"{server_url}/denoise", data=_wav_bytes(audio), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
            assert float(r.headers["X-Latency-Ms"]) > 0
        from scipy.io import wavfile

        sr, out = wavfile.read(io.BytesIO(body))
        assert sr == 8000
        assert len(out) == 6000  # padded to bucket internally, trimmed back

    def test_resamples_input(self, server_url, rng):
        audio = np.clip(rng.standard_normal(16000) * 0.2, -1, 1).astype(np.float32)
        req = urllib.request.Request(
            f"{server_url}/denoise", data=_wav_bytes(audio, sr=16000), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            from scipy.io import wavfile

            sr, out = wavfile.read(io.BytesIO(r.read()))
        assert sr == 8000 and len(out) == 8000

    def test_bad_payload_400(self, server_url):
        req = urllib.request.Request(
            f"{server_url}/denoise", data=b"not a wav", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_too_long_clip_400(self, server_url, rng):
        audio = np.zeros(8000 * 11, np.float32)  # > max_seconds=10
        req = urllib.request.Request(
            f"{server_url}/denoise", data=_wav_bytes(audio), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_unknown_path_404(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server_url}/nope")
        assert e.value.code == 404

    def test_unknown_mode_400(self, server_url, rng):
        audio = np.zeros(4000, np.float32)
        req = urllib.request.Request(
            f"{server_url}/denoise?mode=bogus", data=_wav_bytes(audio), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_auto_mode_without_router_400(self, server_url, rng):
        audio = np.zeros(4000, np.float32)
        req = urllib.request.Request(
            f"{server_url}/denoise?mode=auto", data=_wav_bytes(audio),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400


class TestAutoRoutedServing:
    @pytest.fixture(scope="class")
    def routed_service(self):
        from audiodenoiser_tpu.models.router import NOISE_CLASSES, NoiseClassifier

        model = UNet(features=(4, 8), bottleneck=16)
        expert_runners = {}
        for i in range(len(NOISE_CLASSES)):
            state = create_train_state(
                jax.random.key(i), model, input_shape=(1, 32, 32, 1)
            )
            expert_runners[i] = DenoiserRunner(
                model, {"params": state.params, "batch_stats": state.batch_stats}
            )
        router = NoiseClassifier()
        router_params = router.init(
            jax.random.key(42), jax.numpy.zeros((1, 64, 64, 1))
        )["params"]
        return DenoiseService(
            expert_runners[0],
            bucket_samples=8000,
            max_seconds=10.0,
            default_mode="auto",
            router=(router, router_params),
            expert_runners=expert_runners,
        )

    def test_routed_denoise(self, routed_service, rng):
        audio = np.clip(rng.standard_normal(6000) * 0.2, -1, 1).astype(np.float32)
        out = routed_service.denoise(audio, mode="auto")
        assert out.shape == (6000,)
        assert np.isfinite(out).all()

    def test_routed_matches_predicted_expert(self, routed_service, rng):
        """The auto output must equal the predicted specialist's
        noisy-phase output on the same padded clip."""
        audio = np.clip(rng.standard_normal(8000) * 0.2, -1, 1).astype(np.float32)
        out = routed_service.denoise(audio, mode="auto")
        import jax.numpy as jnp

        label = int(
            np.asarray(routed_service._classify(jnp.asarray(audio[None])))[0]
        )
        want = np.asarray(
            routed_service.expert_runners[label].denoise_audio(
                jnp.asarray(audio[None]), routed_service._key,
                mode="noisy_phase",
            )
        )[0]
        np.testing.assert_allclose(out, want, atol=1e-5)


class TestMicroBatching:
    def _service_with_fake_runner(self, delay=0.05, **kwargs):
        import time as _time

        class FakeRunner:
            def __init__(self):
                self.batch_sizes = []

            def denoise_audio(self, audio, key, mode="noisy_phase", **kw):
                self.batch_sizes.append(audio.shape[0])
                _time.sleep(delay)  # device "busy": lets followers pile up
                return audio  # identity

        fake = FakeRunner()
        return DenoiseService(fake, bucket_samples=4000, **kwargs), fake

    def test_warmup_precompiles_first_bucket(self):
        """warmup=True drives the runner once at batch 1 and once at
        max_batch on the first bucket before serving starts."""
        service, fake = self._service_with_fake_runner(delay=0.0, warmup=True)
        assert sorted(fake.batch_sizes) == [1, service.max_batch]
        n_warm = len(fake.batch_sizes)
        out = service.denoise(np.ones(2000, np.float32))
        assert out.shape == (2000,)
        assert len(fake.batch_sizes) == n_warm + 1

    def test_concurrent_requests_coalesce(self, rng):
        """Requests arriving while the device is busy run as ONE batched
        call, and every caller gets its own (trimmed) result back."""
        service, fake = self._service_with_fake_runner()
        clips = [
            (0.1 * (i + 1) * np.ones(2000 + 100 * i)).astype(np.float32)
            for i in range(5)
        ]
        results = [None] * 5

        def call(i):
            results[i] = service.denoise(clips[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(5):
            np.testing.assert_array_equal(results[i], clips[i])
        assert service.requests_served == 5
        # strictly fewer device calls than requests = real coalescing
        assert service.batches_run < 5
        assert max(fake.batch_sizes) > 1

    def test_mixed_buckets_not_merged(self):
        service, fake = self._service_with_fake_runner(delay=0.02)
        a = np.ones(2000, np.float32)   # bucket 4000
        b = np.ones(6000, np.float32)   # bucket 8000
        results = {}

        def call(name, clip):
            results[name] = service.denoise(clip)

        ts = [threading.Thread(target=call, args=("a", a)),
              threading.Thread(target=call, args=("b", b))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(results["a"]) == 2000 and len(results["b"]) == 6000
        np.testing.assert_array_equal(results["a"], a)
        np.testing.assert_array_equal(results["b"], b)

    def test_error_propagates_to_caller(self):
        class BoomRunner:
            def denoise_audio(self, audio, key, mode="noisy_phase", **kw):
                raise RuntimeError("boom")

        service = DenoiseService(BoomRunner(), bucket_samples=4000)
        with pytest.raises(RuntimeError, match="boom"):
            service.denoise(np.ones(100, np.float32))

    pass


class TestStreamingHTTP:
    @pytest.fixture(scope="class")
    def stream_url(self):
        from audiodenoiser_tpu.eval.streaming import StreamingDenoiser

        class _Identity(UNet):
            def __call__(self, x, train=False):
                return x

        runner = DenoiserRunner(_Identity(), {})
        service = DenoiseService(runner, bucket_samples=8000)
        streamer = StreamingDenoiser(runner, chunk_samples=2048)
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: streamer.session(),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        server.shutdown()

    def _post(self, url, data=b""):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    def test_chunked_session_roundtrip(self, stream_url, rng):
        """Push a long signal in packets over HTTP; output arrives
        incrementally within the advertised latency budget and (identity
        net) reconstructs the input."""
        info = json.loads(self._post(f"{stream_url}/stream/start"))
        sid = info["session"]
        assert info["format"] == "f32le"
        latency = info["latency_samples"]
        assert latency == 2048
        x = np.clip(rng.standard_normal(9000) * 0.2, -1, 1).astype(np.float32)
        got = []
        pushed = 0
        for piece in np.array_split(x, 7):
            out = self._post(
                f"{stream_url}/stream/{sid}", piece.astype("<f4").tobytes()
            )
            got.append(np.frombuffer(out, "<f4"))
            pushed += len(piece)
            # bounded latency: everything but the WOLA lookahead is out
            assert sum(len(g) for g in got) >= pushed - latency
        got.append(np.frombuffer(
            self._post(f"{stream_url}/stream/{sid}/flush"), "<f4"
        ))
        y = np.concatenate(got)
        assert len(y) >= len(x)
        np.testing.assert_allclose(y[: len(x)], x, atol=2e-3)
        # the flush closed the session
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(f"{stream_url}/stream/{sid}", b"")
        assert e.value.code == 404

    def test_rate_adapted_session_16k_client(self, stream_url, rng):
        """POST /stream/start?rate=16000 over an 8 kHz service: the rate
        adapter resamples both ways; the stream is sample-exact at the
        client rate and a band-limited signal survives the identity
        round-trip."""
        info = json.loads(
            self._post(f"{stream_url}/stream/start?rate=16000")
        )
        sid = info["session"]
        assert info["sample_rate"] == 16000
        n = 4 * 16000
        t = np.arange(n) / 16000.0
        x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        got = []
        for piece in np.array_split(x, 9):
            out = self._post(
                f"{stream_url}/stream/{sid}", piece.astype("<f4").tobytes()
            )
            got.append(np.frombuffer(out, "<f4"))
        got.append(np.frombuffer(
            self._post(f"{stream_url}/stream/{sid}/flush"), "<f4"
        ))
        y = np.concatenate(got)
        assert len(y) == n  # sample-exact at the CLIENT rate
        s, e = 8000, n - 8000
        np.testing.assert_allclose(y[s:e], x[s:e], atol=2e-3)

    def test_bad_rate_param_400(self, stream_url):
        for bad in ("abc", "10"):
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(f"{stream_url}/stream/start?rate={bad}")
            assert e.value.code == 400

    def test_matching_rate_param_no_adapter(self, stream_url, rng):
        """?rate= equal to the service rate is a no-op (no resamplers)."""
        info = json.loads(
            self._post(f"{stream_url}/stream/start?rate=8000")
        )
        assert info["sample_rate"] == 8000
        assert info["latency_samples"] == 2048  # inner session, unwrapped
        self._post(f"{stream_url}/stream/{info['session']}/flush")

    def test_unknown_session_404(self, stream_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(f"{stream_url}/stream/{'0' * 16}", b"\x00" * 4)
        assert e.value.code == 404

    def test_streaming_disabled_404(self, server_url):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(f"{server_url}/stream/start")
        assert e.value.code == 404

    def test_internal_stream_fault_is_500_not_400(self):
        """A server-side failure mid-process (device error) must surface
        as 5xx — clients treat 400 as their own fault and never retry,
        and 5xx monitoring would stay silent."""

        class _FaultySession:
            latency_samples = 0

            def process(self, samples):
                raise RuntimeError("device exploded")

            def flush(self):
                return np.zeros(0, np.float32)

        runner = DenoiserRunner(UNet(features=(4, 8), bottleneck=16), {})
        service = DenoiseService.__new__(DenoiseService)  # no warmup path
        service.sample_rate = 8000
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: _FaultySession(),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            info = json.loads(
                self._post(f"http://127.0.0.1:{port}/stream/start")
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(
                    f"http://127.0.0.1:{port}/stream/{info['session']}",
                    b"\x00" * 8,
                )
            assert e.value.code == 500
        finally:
            server.shutdown()


class TestFairnessAndBackpressure:
    _service_with_fake_runner = TestMicroBatching._service_with_fake_runner

    def test_no_starvation_under_sustained_single_bucket_load(self):
        """Round-robin fairness (VERDICT r2 weak #7): a continuous stream
        of bucket-A requests must not starve a lone bucket-B request —
        B completes while the A flood is still arriving."""
        service, fake = self._service_with_fake_runner(delay=0.02)
        stop = threading.Event()
        a = np.ones(2000, np.float32)   # bucket 4000
        b = np.ones(6000, np.float32)   # bucket 8000

        def flood():
            while not stop.is_set():
                try:
                    service.denoise(a)
                except Exception:
                    return

        floods = [threading.Thread(target=flood, daemon=True)
                  for _ in range(4)]
        for t in floods:
            t.start()
        time.sleep(0.1)  # flood established, dispatcher busy on bucket A
        done = threading.Event()
        out = {}

        def lone():
            out["b"] = service.denoise(b)
            done.set()

        threading.Thread(target=lone, daemon=True).start()
        # the lone request must finish well before the flood stops
        assert done.wait(timeout=5.0), "bucket-B request starved"
        stop.set()
        np.testing.assert_array_equal(out["b"], b)
        for t in floods:
            t.join(timeout=5.0)

    def test_overload_returns_503(self):
        """Bounded admission: when the queue is full, denoise() raises
        ServiceOverloaded (mapped to HTTP 503) instead of queueing
        without limit."""
        from audiodenoiser_tpu.serve.server import ServiceOverloaded

        service, fake = self._service_with_fake_runner(
            delay=0.2, max_queue=2, max_batch=1
        )
        a = np.ones(1000, np.float32)
        errors = []
        oks = []

        def call():
            try:
                oks.append(service.denoise(a))
            except ServiceOverloaded as e:
                errors.append(e)

        threads = [threading.Thread(target=call) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors, "expected at least one overload rejection"
        assert oks, "some requests should still succeed"
        assert len(oks) + len(errors) == 12


class TestServingBypassGate:
    def test_gate_passes_clean_clips_through_verbatim(self, rng):
        """With a forced-identity network the noisy_phase path reduces to
        istft(stft(x)) ~= x (~ -60 dB change): the gate at 40 dB fires
        and the service returns the input bit-exactly, while the ungated
        service returns the float-level-different reconstruction."""
        from audiodenoiser_tpu.models import UNet as RealUNet

        class Identity(RealUNet):
            def __call__(self, x, train=False):
                return x

        runner = DenoiserRunner(Identity(), {})
        audio = np.clip(
            rng.standard_normal(4000) * 0.2, -1, 1
        ).astype(np.float32)
        gated = DenoiseService(
            runner, bucket_samples=8000, bypass_db=40.0
        ).denoise(audio)
        np.testing.assert_array_equal(gated, audio)
        plain = DenoiseService(runner, bucket_samples=8000).denoise(audio)
        assert not np.array_equal(plain, audio)
        np.testing.assert_allclose(plain, audio, atol=1e-3)
        # <=0 disables: identical to the default-off service
        off = DenoiseService(
            runner, bucket_samples=8000, bypass_db=0.0
        ).denoise(audio)
        np.testing.assert_array_equal(off, plain)


class TestFoldedServing:
    def test_folded_service_matches_unfolded(self, rng):
        """A BN-folded runner (cli.serve --fold) serves audio matching the
        live-BN service within bf16 rounding (models/folded.py)."""
        from audiodenoiser_tpu.models import fold_runner_inputs

        model = UNet(features=(4, 8), bottleneck=16)
        state = create_train_state(
            jax.random.key(1), model, input_shape=(1, 32, 32, 1)
        )
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        audio = np.clip(
            rng.standard_normal(6000) * 0.2, -1, 1
        ).astype(np.float32)
        plain = DenoiseService(
            DenoiserRunner(model, variables), bucket_samples=8000
        ).denoise(audio)
        fm, fv = fold_runner_inputs(model, variables)
        folded = DenoiseService(
            DenoiserRunner(fm, fv), bucket_samples=8000
        ).denoise(audio)
        assert folded.shape == plain.shape
        err = np.linalg.norm(folded - plain) / (np.linalg.norm(plain) + 1e-12)
        assert err < 0.05, err

    def test_fold_flag_parses(self):
        from audiodenoiser_tpu.cli.serve import parse_args

        assert parse_args(["--fold"]).fold
        assert not parse_args([]).fold


@pytest.mark.soak
class TestServeSoak:
    """Sustained mixed load with checkpoint hot-reload under fire
    (VERDICT r3 next #6): batched /denoise + pooled streams near capacity,
    POST /admin/reload mid-traffic, then assert zero dropped or corrupted
    sessions, a p99 latency bound, correct generation counters, and full
    pool-slot recovery. The two generations are distinguishable by
    construction (identity vs 0.5x gain), so every byte served is
    attributable to exactly one generation — a response mixing weights
    would match neither. The 10-minute memory-stability soak lives in
    examples/soak_serve.py (docs table); this in-suite version compresses
    the same traffic shape into ~1 minute."""

    GAIN1 = 0.5

    @pytest.fixture()
    def soak_server(self):
        from audiodenoiser_tpu.eval.streaming import (
            MultiStreamWola,
            PooledStreamSessions,
        )

        class _Identity(UNet):
            def __call__(self, x, train=False):
                return x

        class _Half(UNet):
            def __call__(self, x, train=False):
                return x * TestServeSoak.GAIN1

        runners = [DenoiserRunner(_Identity(), {}),
                   DenoiserRunner(_Half(), {})]
        service = DenoiseService(runners[0], bucket_samples=8000,
                                 max_seconds=10.0)
        # generation-aware stream factory, as cli.serve wires it: new
        # sessions ride the current pool; open sessions keep theirs
        pools = {"cur": {"pool": PooledStreamSessions(
            MultiStreamWola(runners[0], capacity=3, chunk_samples=2048)
        ), "gen": 0}}
        reloads = {"n": 0}

        def reload_fn():
            nxt = runners[(reloads["n"] + 1) % 2]
            pool = PooledStreamSessions(
                MultiStreamWola(nxt, capacity=3, chunk_samples=2048)
            )
            n = service.reload(runner=nxt)
            # one atomic snapshot swap: session + generation stamp always
            # agree, exactly as cli.serve wires it
            pools["cur"] = {"pool": pool, "gen": n}
            reloads["n"] += 1
            return {"generation": n}

        def stream_factory(mode):
            cur = pools["cur"]
            return cur["pool"].session(), cur["gen"]

        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=stream_factory,
            stream_ttl=600.0, reload_fn=reload_fn,
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}", service, reloads
        server.shutdown()

    @staticmethod
    def _post(url, data=b"", timeout=60):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.read()

    def test_soak_reload_under_fire(self, soak_server, rng):
        url, service, reloads = soak_server
        stop = time.monotonic() + 45.0
        errors = []
        latencies = []
        lat_lock = threading.Lock()

        def denoise_client(seed):
            r = np.random.default_rng(seed)
            while time.monotonic() < stop:
                n = int(r.choice([6000, 8000]))
                audio = np.clip(
                    r.standard_normal(n) * 0.2, -0.9, 0.9
                ).astype(np.float32)
                t0 = time.perf_counter()
                try:
                    body = self._post(f"{url}/denoise", _wav_bytes(audio))
                except urllib.error.HTTPError as e:
                    if e.code == 503:
                        time.sleep(0.05)
                        continue
                    errors.append(f"denoise HTTP {e.code}: {e.read()[:200]}")
                    return
                except Exception as e:  # dropped connection = dropped req
                    errors.append(f"denoise {type(e).__name__}: {e}")
                    return
                with lat_lock:
                    latencies.append(time.perf_counter() - t0)
                from scipy.io import wavfile

                got = wavfile.read(io.BytesIO(body))[1] / 32768.0
                # every response must be one generation's output — the
                # identity (rel err vs input small) or the 0.5x gain —
                # never a blend or garbage
                rel = [
                    np.linalg.norm(got[: len(audio)] - g * audio)
                    / (g * np.linalg.norm(audio))
                    for g in (1.0, self.GAIN1)
                ]
                if min(rel) > 0.15:
                    errors.append(f"corrupted denoise response: rel={rel}")
                    return

        def stream_client(seed):
            r = np.random.default_rng(seed)
            while time.monotonic() < stop:
                sig = np.clip(
                    r.standard_normal(3 * 2048) * 0.3, -1, 1
                ).astype(np.float32)
                try:
                    started = json.loads(self._post(f"{url}/stream/start"))
                    sid = started["session"]
                except urllib.error.HTTPError as e:
                    if e.code == 503:  # pool full: expected near capacity
                        time.sleep(0.05)
                        continue
                    errors.append(f"start HTTP {e.code}")
                    return
                # the server reports the generation the session was BUILT
                # from (atomic with the snapshot) — reading
                # service.generation here instead raced with mid-start
                # reloads and mis-attributed sessions (measured: exact
                # err=0.5/1.0 gain mismatches in the soak)
                gen_at_open = started["generation"]
                chunks = []
                try:
                    for i in range(0, len(sig), 1024):
                        got = self._post(
                            f"{url}/stream/{sid}",
                            sig[i: i + 1024].astype("<f4").tobytes(),
                        )
                        chunks.append(np.frombuffer(got, "<f4"))
                    chunks.append(np.frombuffer(
                        self._post(f"{url}/stream/{sid}/flush"), "<f4"
                    ))
                except Exception as e:
                    errors.append(f"stream {type(e).__name__}: {e}")
                    return
                out = np.concatenate(chunks)[: len(sig)]
                # a session opened on generation g keeps g for its whole
                # life, even across a mid-stream reload (even gens are the
                # identity runner, odd gens the 0.5x one)
                g = 1.0 if gen_at_open % 2 == 0 else self.GAIN1
                err = np.linalg.norm(out - g * sig) / (g * np.linalg.norm(sig))
                if err > 0.15:
                    errors.append(
                        f"corrupted stream (gen {gen_at_open}): err={err}"
                    )
                    return

        threads = [
            threading.Thread(target=denoise_client, args=(10 + i,))
            for i in range(3)
        ] + [
            threading.Thread(target=stream_client, args=(20 + i,))
            for i in range(2)
        ]
        for t in threads:
            t.start()
        # fire reloads mid-traffic
        n_reloads = 0
        while time.monotonic() < stop - 8.0:
            time.sleep(8.0)
            info = json.loads(self._post(f"{url}/admin/reload"))
            n_reloads += 1
            assert info["generation"] == n_reloads
        for t in threads:
            t.join(timeout=120)
            assert not t.is_alive(), "soak client hung"

        assert not errors, errors[:5]
        assert n_reloads >= 2, "soak too short to exercise reload under fire"
        # generation counter: exactly one bump per successful reload
        with urllib.request.urlopen(f"{url}/healthz") as r:
            h = json.loads(r.read())
        assert h["model_generation"] == n_reloads
        assert h["requests_served"] > 0
        # p99 latency bound over the whole soak, cold compiles included
        lat = np.sort(latencies)
        assert len(lat) >= 20, f"only {len(lat)} denoise requests completed"
        p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
        assert p99 < 10.0, f"p99 latency {p99:.2f}s"
        # zero leaked sessions: the stream gauge is 0 and all 3 pool slots
        # are immediately reusable
        with urllib.request.urlopen(f"{url}/metrics") as r:
            metrics = r.read().decode()
        assert "adt_stream_sessions 0" in metrics, metrics[-400:]
        sids = [
            json.loads(self._post(f"{url}/stream/start"))["session"]
            for _ in range(3)
        ]
        for sid in sids:
            self._post(f"{url}/stream/{sid}/flush")


class TestServeCLIArgs:
    def test_mixed_noise_type_accepted(self):
        from audiodenoiser_tpu.cli.serve import parse_args

        args = parse_args(
            ["--noise_type", "mixed", "--model", "complex_mask",
             "--bypass_db", "40"]
        )
        assert args.noise_type == "mixed"
        assert args.bypass_db == 40.0

    def test_unknown_noise_type_rejected(self):
        from audiodenoiser_tpu.cli.serve import parse_args

        with pytest.raises(SystemExit):
            parse_args(["--noise_type", "pink"])

    def test_stream_latency_flag(self):
        from audiodenoiser_tpu.cli.serve import parse_args

        assert parse_args([]).stream_latency_ms is None
        args = parse_args(["--stream_latency_ms", "224"])
        assert args.stream_latency_ms == 224.0


class TestLowLatencyStreamHTTP:
    """/stream sessions served by the look-ahead-bounded engine
    (cli.serve --stream_latency_ms)."""

    @pytest.fixture(scope="class")
    def ll_stream_url(self):
        from audiodenoiser_tpu.eval.streaming import (
            LowLatencyStreamingDenoiser,
        )

        class _Identity(UNet):
            def __call__(self, x, train=False):
                return x

        runner = DenoiserRunner(_Identity(), {})
        service = DenoiseService(runner, bucket_samples=8000)
        streamer = LowLatencyStreamingDenoiser.from_latency_budget(
            runner, latency_ms=112.0, sample_rate=8000, window_samples=4096
        )
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: streamer.session(),
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}", streamer
        server.shutdown()

    def _post(self, url, data=b""):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    def test_low_latency_session_roundtrip(self, ll_stream_url, rng):
        url, streamer = ll_stream_url
        info = json.loads(self._post(f"{url}/stream/start"))
        sid = info["session"]
        latency = info["latency_samples"]
        assert latency == streamer.latency_samples  # 896 @112 ms, not 2 s
        x = np.clip(rng.standard_normal(6000) * 0.2, -1, 1).astype(np.float32)
        got = []
        pushed = 0
        for piece in np.array_split(x, 9):
            out = self._post(
                f"{url}/stream/{sid}", piece.astype("<f4").tobytes()
            )
            got.append(np.frombuffer(out, "<f4"))
            pushed += len(piece)
            assert sum(len(g) for g in got) >= pushed - latency
        got.append(np.frombuffer(
            self._post(f"{url}/stream/{sid}/flush"), "<f4"
        ))
        y = np.concatenate(got)
        assert len(y) >= len(x)
        np.testing.assert_allclose(y[: len(x)], x, atol=2e-3)


class TestMetricsEndpoint:
    def test_metrics_exposes_counters_and_latency_histogram(
        self, server_url, rng
    ):
        audio = np.clip(
            rng.standard_normal(4000) * 0.2, -1, 1
        ).astype(np.float32)
        req = urllib.request.Request(
            f"{server_url}/denoise", data=_wav_bytes(audio), method="POST"
        )
        urllib.request.urlopen(req).read()
        with urllib.request.urlopen(f"{server_url}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "adt_requests_total" in text
        served = int(
            [ln for ln in text.splitlines()
             if ln.startswith("adt_requests_total")][0].split()[1]
        )
        assert served >= 1
        count = int(
            [ln for ln in text.splitlines()
             if ln.startswith("adt_request_latency_ms_count")][0].split()[1]
        )
        assert count >= 1
        # cumulative histogram: +Inf bucket equals the count
        inf = int(
            [ln for ln in text.splitlines() if 'le="+Inf"' in ln][0].split()[1]
        )
        assert inf == count
        assert "adt_queue_depth" in text and "adt_stream_sessions" in text

    def test_overload_increments_counter(self):
        from audiodenoiser_tpu.serve.server import ServiceOverloaded

        class SlowRunner:
            def denoise_audio(self, audio, key, mode="noisy_phase", **kw):
                time.sleep(0.2)
                return audio

        service = DenoiseService(
            SlowRunner(), bucket_samples=4000, max_queue=1, max_batch=1
        )
        a = np.ones(1000, np.float32)
        hits = {"overload": 0}

        def call():
            try:
                service.denoise(a)
            except ServiceOverloaded:
                hits["overload"] += 1

        threads = [threading.Thread(target=call) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert hits["overload"] >= 1
        assert f"adt_overloaded_total {hits['overload']}" in (
            service.metrics_text()
        )


class TestStreamSessionCap:
    def test_session_limit_returns_503(self):
        """Streams hold device-resident WOLA state; acceptance is bounded
        like the batch queue, surfacing 503 on the session limit."""

        class _NullSession:
            latency_samples = 0

            def process(self, samples):
                return np.zeros(0, np.float32)

            def flush(self):
                return np.zeros(0, np.float32)

        service = DenoiseService.__new__(DenoiseService)
        service.sample_rate = 8000
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: _NullSession(),
            max_stream_sessions=2,
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}/stream/start"
            for _ in range(2):
                req = urllib.request.Request(url, data=b"", method="POST")
                urllib.request.urlopen(req).read()
            req = urllib.request.Request(url, data=b"", method="POST")
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 503
            assert e.value.headers.get("Retry-After") == "1"
        finally:
            server.shutdown()


def test_stream_cap_rejections_count_as_overloads(rng):
    """Stream 503s must surface in adt_overloaded_total so overload
    monitoring sees them (round-3 review finding)."""

    class _NullSession:
        latency_samples = 0

        def process(self, samples):
            return np.zeros(0, np.float32)

        def flush(self):
            return np.zeros(0, np.float32)

    class IdRunner:
        def denoise_audio(self, audio, key, mode="noisy_phase", **kw):
            return audio

    service = DenoiseService(IdRunner(), bucket_samples=4000)
    server = make_http_server(
        service, "127.0.0.1", 0,
        stream_factory=lambda mode: _NullSession(),
        max_stream_sessions=1,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/stream/start"
        urllib.request.urlopen(
            urllib.request.Request(url, data=b"", method="POST")
        ).read()
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                urllib.request.Request(url, data=b"", method="POST")
            )
        assert e.value.code == 503
        metrics = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics"
        ).read().decode()
        assert "adt_overloaded_total 1" in metrics
    finally:
        server.shutdown()


class TestPooledStreamingHTTP:
    """--stream_pool: sessions share a MultiStreamWola, one dispatch/tick."""

    @pytest.fixture(scope="class")
    def pool_url(self):
        from audiodenoiser_tpu.eval.streaming import (
            MultiStreamWola,
            PooledStreamSessions,
        )

        class _Identity(UNet):
            def __call__(self, x, train=False):
                return x

        runner = DenoiserRunner(_Identity(), {})
        service = DenoiseService(runner, bucket_samples=8000)
        pooled = PooledStreamSessions(
            MultiStreamWola(runner, capacity=2, chunk_samples=2048)
        )
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: pooled.session(),
            stream_ttl=600.0,
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        server.shutdown()

    def _post(self, url, data=b""):
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    def test_two_pooled_sessions_reconstruct_identity(self, pool_url, rng):
        """Two concurrent pooled streams through HTTP: identity network +
        COLA crossfade reconstruct each input exactly, no cross-talk."""
        sigs = [
            np.clip(rng.standard_normal(3 * 2048) * 0.3, -1, 1).astype(
                np.float32
            )
            for _ in range(2)
        ]
        sids = [
            json.loads(self._post(f"{pool_url}/stream/start"))["session"]
            for _ in range(2)
        ]
        outs = [[], []]
        for i in range(0, 3 * 2048, 1024):
            for j, (sid, sig) in enumerate(zip(sids, sigs)):
                got = self._post(
                    f"{pool_url}/stream/{sid}",
                    sig[i: i + 1024].astype("<f4").tobytes(),
                )
                outs[j].append(np.frombuffer(got, "<f4"))
        for j, sid in enumerate(sids):
            outs[j].append(
                np.frombuffer(
                    self._post(f"{pool_url}/stream/{sid}/flush"), "<f4"
                )
            )
        for j, sig in enumerate(sigs):
            out = np.concatenate(outs[j])
            np.testing.assert_allclose(
                out[: len(sig)], sig, rtol=0, atol=1e-5
            )

    def test_pool_exhaustion_returns_503_and_slot_recycles(self, pool_url):
        sids = [
            json.loads(self._post(f"{pool_url}/stream/start"))["session"]
            for _ in range(2)
        ]
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(f"{pool_url}/stream/start")
        assert e.value.code == 503
        # flushing one session frees its slot for a new stream
        self._post(f"{pool_url}/stream/{sids[0]}/flush")
        sid = json.loads(self._post(f"{pool_url}/stream/start"))["session"]
        self._post(f"{pool_url}/stream/{sid}/flush")
        self._post(f"{pool_url}/stream/{sids[1]}/flush")


class TestPooledServeCLIArgs:
    def test_stream_pool_zero_rejected_before_device_init(self):
        from audiodenoiser_tpu.cli.serve import main

        with pytest.raises(SystemExit):
            main(["--stream_pool", "0"])

    def test_stream_pool_with_latency_budget_rejected(self):
        from audiodenoiser_tpu.cli.serve import main

        with pytest.raises(SystemExit):
            main(["--stream_pool", "4", "--stream_latency_ms", "224"])

    def test_stream_pool_garbage_rejected_before_device_init(self):
        from audiodenoiser_tpu.cli.serve import main

        with pytest.raises(SystemExit):
            main(["--stream_pool", "lots"])

    def test_stream_pool_auto_passes_validation(self):
        # 'auto' must survive flag validation and only fail later at the
        # checkpoint load (no saved_models at the bogus path)
        from audiodenoiser_tpu.cli.serve import main

        try:
            main(
                ["--stream_pool", "auto",
                 "--saved_models_dir", "/nonexistent_dir_xyz"]
            )
        except SystemExit as e:  # must not be the flag-validation exit
            assert "integer" not in str(e)
        except Exception:
            pass  # checkpoint-load failure is the expected downstream error


class TestPooledEviction:
    """TTL eviction must release the pool slot and turn late packets into
    404s, never stage them into a recycled slot."""

    def test_evicted_pooled_session_404_and_slot_recycles(self):
        from audiodenoiser_tpu.eval.streaming import (
            MultiStreamWola,
            PooledStreamSessions,
        )

        class _Identity(UNet):
            def __call__(self, x, train=False):
                return x

        runner = DenoiserRunner(_Identity(), {})
        service = DenoiseService(runner, bucket_samples=8000)
        pooled = PooledStreamSessions(
            MultiStreamWola(runner, capacity=1, chunk_samples=2048)
        )
        server = make_http_server(
            service, "127.0.0.1", 0,
            stream_factory=lambda mode: pooled.session(),
            stream_ttl=0.3,
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"

        def post(url, data=b""):
            req = urllib.request.Request(url, data=data, method="POST")
            with urllib.request.urlopen(req) as r:
                return r.read()

        try:
            sid = json.loads(post(f"{base}/stream/start"))["session"]
            time.sleep(0.5)  # exceed the ttl
            # a new start triggers eviction of the idle session AND takes
            # over the capacity-1 pool's only slot
            sid2 = json.loads(post(f"{base}/stream/start"))["session"]
            # a late packet for the evicted session must 404, not stage
            # into sid2's recycled slot
            with pytest.raises(urllib.error.HTTPError) as e:
                post(
                    f"{base}/stream/{sid}",
                    np.zeros(1024, "<f4").tobytes(),
                )
            assert e.value.code == 404
            post(f"{base}/stream/{sid2}/flush")
        finally:
            server.shutdown()


class TestHotReload:
    """POST /admin/reload: checkpoint generation hot-swap (service.reload)."""

    def _server(self, reload_fn):
        class ScaleRunner:
            def __init__(self, scale):
                self.scale = scale

            def denoise_audio(self, audio, key, mode="noisy_phase", **kw):
                return audio * self.scale

        svc = DenoiseService(ScaleRunner(1.0), bucket_samples=4000)
        fn = (lambda: reload_fn(svc, ScaleRunner)) if reload_fn else None
        server = make_http_server(svc, "127.0.0.1", 0, reload_fn=fn)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return svc, server, f"http://127.0.0.1:{port}"

    def test_reload_swaps_runner_and_bumps_generation(self, rng):
        def do_reload(svc, ScaleRunner):
            return {"generation": svc.reload(runner=ScaleRunner(2.0))}

        svc, server, url = self._server(do_reload)
        try:
            x = rng.standard_normal(4000).astype(np.float32) * 0.1
            before = svc.denoise(x)
            r = urllib.request.urlopen(urllib.request.Request(
                f"{url}/admin/reload", method="POST"), timeout=10)
            assert json.loads(r.read())["generation"] == 1
            after = svc.denoise(x)
            np.testing.assert_allclose(after, before * 2.0, rtol=1e-6)
            health = json.loads(
                urllib.request.urlopen(f"{url}/healthz", timeout=10).read()
            )
            assert health["model_generation"] == 1
            metrics = urllib.request.urlopen(f"{url}/metrics", timeout=10).read()
            assert b"adt_model_generation 1" in metrics
        finally:
            server.shutdown()

    def test_failed_reload_keeps_old_generation(self, rng):
        def do_reload(svc, ScaleRunner):
            raise IOError("checkpoint dir is broken")

        svc, server, url = self._server(do_reload)
        try:
            x = rng.standard_normal(4000).astype(np.float32) * 0.1
            before = svc.denoise(x)
            try:
                urllib.request.urlopen(urllib.request.Request(
                    f"{url}/admin/reload", method="POST"), timeout=10)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "broken" in json.loads(e.read())["error"]
            after = svc.denoise(x)
            np.testing.assert_allclose(after, before, rtol=1e-6)
            assert svc.generation == 0
        finally:
            server.shutdown()

    def test_reload_unconfigured_501(self):
        svc, server, url = self._server(None)
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{url}/admin/reload", method="POST"), timeout=10)
            assert False, "expected HTTP 501"
        except urllib.error.HTTPError as e:
            assert e.code == 501
        finally:
            server.shutdown()
