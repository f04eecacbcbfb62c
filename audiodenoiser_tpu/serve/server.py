"""Serving runtime: an HTTP denoising service over the fused graph.

The reference has no serving story at all (eval is an offline script,
``/root/reference/code/test.py``). This module turns the single-XLA-program
inference path into a deployable service:

- ``DenoiseService`` wraps a ``DenoiserRunner`` with **length bucketing**:
  incoming audio is zero-padded up to the next bucket boundary so the jit
  cache holds one compiled program per bucket instead of one per request
  length (XLA static shapes), then trimmed back after reconstruction;
- ``make_http_server`` exposes it over stdlib HTTP (zero extra deps):
  ``GET /healthz`` for liveness/device info, ``POST /denoise`` with WAV
  bytes in, denoised WAV bytes out (``X-Latency-Ms`` response header),
  query params ``mode=noisy_phase|griffin_lim|reference_gl|complex_mask``.

Requests are serialized through a lock — one device, one program at a
time; the bucketed shapes keep steady-state latency deterministic.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np

from audiodenoiser_tpu.eval.runner import DenoiserRunner


class DenoiseService:
    def __init__(
        self,
        runner: DenoiserRunner,
        sample_rate: int = 8000,
        bucket_samples: int = 16000,
        max_seconds: float = 60.0,
        default_mode: str = "noisy_phase",
    ):
        self.runner = runner
        self.sample_rate = sample_rate
        self.bucket = bucket_samples
        self.max_samples = int(max_seconds * sample_rate)
        self.default_mode = default_mode
        self._lock = threading.Lock()
        self._key = jax.random.key(0)
        self.requests_served = 0

    def _bucket_len(self, n: int) -> int:
        return max(self.bucket, -(-n // self.bucket) * self.bucket)

    def denoise(self, audio: np.ndarray, mode: str | None = None) -> np.ndarray:
        """Denoise one mono clip (float32 [-1,1]); thread-safe."""
        mode = mode or self.default_mode
        n = len(audio)
        if n == 0:
            raise ValueError("empty audio")
        if n > self.max_samples:
            raise ValueError(f"clip too long: {n} > {self.max_samples} samples")
        padded_len = self._bucket_len(n)
        padded = np.zeros(padded_len, np.float32)
        padded[:n] = audio
        with self._lock:
            out = self.runner.denoise_audio(
                jax.numpy.asarray(padded[None]), self._key, mode=mode
            )
            result = np.asarray(out)[0, :n]
            self.requests_served += 1
        return result


def _read_wav_bytes(data: bytes, sample_rate: int) -> np.ndarray:
    from scipy.io import wavfile

    from audiodenoiser_tpu.data.wav_io import _to_float32, resample

    sr, raw = wavfile.read(io.BytesIO(data))
    y = _to_float32(np.asarray(raw))
    if y.ndim == 2:
        y = y.mean(axis=1)
    if sr != sample_rate:
        y = resample(y, sr, sample_rate)
    return np.ascontiguousarray(y, np.float32)


def _write_wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    wavfile.write(buf, sample_rate, pcm)
    return buf.getvalue()


def make_http_server(
    service: DenoiseService, host: str = "127.0.0.1", port: int = 8800
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call .serve_forever() to run."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str, extra=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                info = {
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "sample_rate": service.sample_rate,
                    "requests_served": service.requests_served,
                }
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/denoise":
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                mode = parse_qs(parsed.query).get("mode", [None])[0]
                t0 = time.perf_counter()
                audio = _read_wav_bytes(data, service.sample_rate)
                out = service.denoise(audio, mode=mode)
                wav = _write_wav_bytes(out, service.sample_rate)
                latency_ms = (time.perf_counter() - t0) * 1e3
                self._send(
                    200, wav, "audio/wav",
                    {"X-Latency-Ms": f"{latency_ms:.1f}"},
                )
            except ValueError as e:
                self._send(
                    400, json.dumps({"error": str(e)}).encode(), "application/json"
                )
            except Exception as e:  # malformed wav etc.
                self._send(
                    400,
                    json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json",
                )

    return ThreadingHTTPServer((host, port), Handler)
