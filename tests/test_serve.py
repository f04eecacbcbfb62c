"""HTTP serving runtime: health, denoise round-trip, error paths."""

import io
import json
import threading
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
