"""Streaming chunked real-time denoising with overlap-add crossfade.

BASELINE.json config 5 ("streaming chunked real-time denoising ... with
overlap-add latency budget") — a capability the reference approximates only
by slicing files into independent 2 s chunks offline
(``create_train_dataset.py:71-84``). Here the long-context strategy is
weighted overlap-add at the *chunk* level (SURVEY.md §5 long-context plan):

- the signal is processed in windows of ``chunk_samples`` advanced by 50%,
  each denoised through the fused STFT -> U-Net -> iSTFT graph
  (``DenoiserRunner.denoise_audio`` with noisy phase, center=True so each
  window reconstructs at full length);
- windows are crossfaded with a sqrt-Hann^2-complementary (= Hann) weight,
  which sums to one at 50% overlap (COLA), so a bypass network reconstructs
  the input exactly;
- **offline**: one ``lax.scan`` over windows inside a single jit;
- **online**: ``StreamingSession.process`` consumes arbitrary sample counts
  and emits denoised audio with a fixed ``chunk_samples`` latency budget —
  one fixed-shape compiled step per hop, ready for a real-time loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.dsp.window import hann_window
from audiodenoiser_tpu.eval.runner import DenoiserRunner


class StreamingDenoiser:
    """Chunked WOLA denoiser around a fused single-chunk graph."""

    def __init__(
        self,
        runner: DenoiserRunner,
        chunk_samples: int = 16000,
        sample_rate: int = 8000,
    ):
        if chunk_samples % 2:
            raise ValueError("chunk_samples must be even (50% overlap)")
        self.runner = runner
        self.chunk = chunk_samples
        self.hop = chunk_samples // 2
        self.sample_rate = sample_rate
        # Hann window sums to 1 at 50% overlap (periodic form)
        self.xfade = jnp.asarray(hann_window(chunk_samples))

    @functools.partial(jax.jit, static_argnames=("self",))
    def _denoise_window(self, window: jax.Array) -> jax.Array:
        out = self.runner.denoise_audio(
            window[None, :], jax.random.key(0), mode="noisy_phase"
        )[0]
        return out * self.xfade

    @functools.partial(jax.jit, static_argnames=("self", "n_windows"))
    def _scan_windows(self, padded: jax.Array, n_windows: int) -> jax.Array:
        def body(carry, i):
            start = i * self.hop
            win = jax.lax.dynamic_slice_in_dim(padded, start, self.chunk)
            return carry, self._denoise_window(win)

        _, outs = jax.lax.scan(
            body, 0, jnp.arange(n_windows)
        )  # (n_windows, chunk)
        out_len = padded.shape[-1]
        acc = jnp.zeros(out_len, padded.dtype)
        # scatter-free WOLA: windows at even/odd positions are disjoint
        even = outs[0::2].reshape(-1)
        odd = outs[1::2].reshape(-1)
        acc = acc.at[: even.shape[0]].add(even)
        acc = acc.at[self.hop : self.hop + odd.shape[0]].add(odd)
        return acc

    def denoise(self, audio: np.ndarray | jax.Array) -> np.ndarray:
        """Offline streaming-equivalent denoise of a full signal."""
        audio = jnp.asarray(audio)
        n = audio.shape[-1]
        # lead-in/out padding so every sample gets full window weight
        n_windows = max(1, int(np.ceil(n / self.hop)) + 1)
        padded_len = (n_windows + 1) * self.hop
        padded = jnp.pad(audio, (self.hop, padded_len - n - self.hop))
        out = self._scan_windows(padded, n_windows)
        return np.asarray(out[self.hop : self.hop + n])

    def session(self) -> "StreamingSession":
        return StreamingSession(self)


class StreamingSession:
    """Stateful real-time wrapper: push samples, pull denoised samples.

    Latency budget: ``chunk_samples`` of lookahead (one window at 50%
    overlap — window k's first half only finalizes once window k+1 is in).
    Each ``process`` call runs one fixed-shape compiled step per completed
    hop, so steady-state cost is deterministic.

    Internals: the input stream is prefixed with a synthetic half-window of
    silence so every *real* sample receives full crossfade weight. Window k
    starts at stream position k*hop; after denoising and accumulating it,
    stream span [k*hop, (k+1)*hop) is finalized and emitted (the k=0
    emission is the silent lead-in and is dropped).
    """

    def __init__(self, parent: StreamingDenoiser):
        self.p = parent
        # stream buffer starts with the synthetic lead-in
        self._buf = np.zeros(parent.hop, np.float32)
        self._buf_base = 0  # stream position of _buf[0]
        self._win_idx = 0  # next window index to process
        self._ola = np.zeros(parent.chunk, np.float32)  # base = win_idx*hop

    @property
    def latency_samples(self) -> int:
        return self.p.chunk

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Feed samples; returns whatever denoised audio is finalized."""
        p = self.p
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        out = []
        while True:
            start = self._win_idx * p.hop - self._buf_base
            if start + p.chunk > len(self._buf):
                break
            win = self._buf[start : start + p.chunk]
            den = np.asarray(p._denoise_window(jnp.asarray(win)))
            self._ola += den
            if self._win_idx >= 1:  # window 0's first hop is the lead-in
                out.append(self._ola[: p.hop].copy())
            self._ola = np.concatenate(
                [self._ola[p.hop :], np.zeros(p.hop, np.float32)]
            )
            self._win_idx += 1
            # trim consumed history (keep from the next window's start)
            keep_from = self._win_idx * p.hop - self._buf_base
            if keep_from > 0:
                self._buf = self._buf[keep_from:]
                self._buf_base += keep_from
        if out:
            return np.concatenate(out)
        return np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """Pad with silence to flush buffered audio; returns the tail."""
        return self.process(np.zeros(self.p.chunk, np.float32))
