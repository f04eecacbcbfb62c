"""Measure the streaming latency/throughput trade-off curve (docs/LATENCY.md).

For each streaming configuration this times the *steady-state real-time
pattern* — one ``process()`` call per hop-sized packet, state device-resident
between calls — and reports the algorithmic latency beside the measured
real-time factor (seconds of audio denoised per wall second; RTF > 1 keeps up
with a live stream). Two session families:

- WOLA (``StreamingDenoiser``): latency = one full chunk; lowering latency
  shrinks the window the model sees (it was trained on 2 s crops).
- Low-latency (``LowLatencyStreamingDenoiser``): rolling full-context window,
  latency = hop + lookahead + xfade, at ``window/hop``x the compute.

Weights do not affect timing, so the model is random-init (same graph,
same numbers as a trained checkpoint). ``--width_mult`` times a compact
student (models.unet.scaled_widths) instead of the 31M reference width —
in relay-bound environments the per-packet RTF barely moves, so the
report also carries an ``on_chip_forward`` row (back-to-back
block_until_ready timing of one full-context window forward), which is
what bounds the low-latency engine's ``window/hop`` compute multiplier
on real hardware.

Usage: python examples/measure_latency.py [--out json_path] [--width_mult W]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.eval.streaming import (
    LowLatencyStreamingDenoiser,
    StreamingDenoiser,
)
from audiodenoiser_tpu.models.unet import UNet
from audiodenoiser_tpu.train.loop import create_train_state


def time_session(make_session, hop: int, sample_rate: int, n_iters: int = 30):
    """Steady per-packet wall time of a session fed hop-sized packets."""
    sess = make_session()
    rng = np.random.default_rng(0)
    packet = np.clip(rng.standard_normal(hop) * 0.2, -1, 1).astype(np.float32)
    # prime: fill the lead-in and compile the k=1 program
    for _ in range(3):
        sess.process(packet)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        sess.process(packet)
    dt = (time.perf_counter() - t0) / n_iters
    return dt, (hop / sample_rate) / dt  # per-packet seconds, RTF


def device_step_time(make_session, hop: int, n_iters: int = 30) -> float:
    """Relay-free per-step milliseconds: the session's compiled k=1 step
    run back-to-back with the state threading device-to-device and ONE
    host fetch at the end. ``process()`` fetches its output every call, so
    its wall time carries the per-dispatch relay round-trip (~31 ms flat
    in this environment); this is what the same step costs when the host
    isn't in the loop — the number production latency claims should quote
    (VERDICT r3 next #8)."""
    import jax.numpy as jnp

    sess = make_session()
    rng = np.random.default_rng(0)
    hops = jnp.asarray(
        np.clip(rng.standard_normal((1, hop)) * 0.2, -1, 1), jnp.float32
    )
    step, state = sess.p._session_steps, sess._state
    state, out = step(state, hops)  # compile the k=1 program
    probe = jax.jit(lambda a: a.ravel()[0])
    float(probe(out))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, out = step(state, hops)
    float(probe(out))  # in-order stream: last done => all done
    return 1000.0 * (time.perf_counter() - t0) / n_iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write results as JSON here")
    ap.add_argument("--sample_rate", type=int, default=8000)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--width_mult", type=float, default=1.0,
        help="time a width-scaled compact student instead of the "
        "reference 31M-param width",
    )
    args = ap.parse_args(argv)
    sr = args.sample_rate

    from audiodenoiser_tpu.models.unet import width_kwargs

    model = UNet(**width_kwargs(args.width_mult))
    state = create_train_state(
        jax.random.key(0), model, input_shape=(1, 256, 64, 1)
    )
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )

    rows = []

    # on-chip bound: one full-context window forward, timed back-to-back
    # (the relay round-trip amortizes away; this is what multiplies by
    # window/hop in the low-latency engine's compute budget)
    window = np.clip(
        np.random.default_rng(0).standard_normal(16000) * 0.2, -1, 1
    ).astype(np.float32)
    # host scalar fetch as the completion barrier: block_until_ready can
    # return early on the axon relay (see eval/bench.py sync())
    probe = jax.jit(lambda a: a.ravel()[0])
    key = jax.random.key(0)
    for _ in range(3):
        out = runner.denoise_audio(window[None], key)
    float(probe(out))
    t0 = time.perf_counter()
    outs = [
        runner.denoise_audio(window[None], key) for _ in range(args.iters)
    ]
    float(probe(outs[-1]))  # in-order stream: last done => all done
    fwd_ms = 1000.0 * (time.perf_counter() - t0) / args.iters
    rows.append({
        "family": "on_chip_forward",
        "config": f"window=16000,width_mult={args.width_mult}",
        "context_samples": 16000, "latency_ms": None,
        "packet_ms": None, "step_ms": fwd_ms,
        "rtf": (16000 / sr) / (fwd_ms / 1000.0),
    })
    print(rows[-1], flush=True)
    for chunk in (16000, 8000, 4000, 2048):
        sd = StreamingDenoiser(runner, chunk_samples=chunk, sample_rate=sr)
        dt, rtf = time_session(sd.session, sd.hop, sr, args.iters)
        dev_ms = device_step_time(sd.session, sd.hop, args.iters)
        rows.append({
            "family": "wola", "config": f"chunk={chunk}",
            "context_samples": chunk,
            "latency_ms": 1000.0 * sd.session().latency_samples / sr,
            "packet_ms": 1000.0 * sd.hop / sr,
            "step_ms": 1000.0 * dt, "rtf": rtf,
            "device_step_ms": dev_ms,
            "device_rtf": (sd.hop / sr) / (dev_ms / 1000.0),
        })
        print(rows[-1], flush=True)

    for hop, la, xf in ((4096, 1024, 512), (2048, 512, 256),
                        (1024, 512, 256), (512, 256, 128)):
        sd = LowLatencyStreamingDenoiser(
            runner, window_samples=16000, hop_samples=hop,
            lookahead_samples=la, xfade_samples=xf, sample_rate=sr,
        )
        dt, rtf = time_session(sd.session, hop, sr, args.iters)
        dev_ms = device_step_time(sd.session, hop, args.iters)
        rows.append({
            "family": "low_latency",
            "config": f"hop={hop},lookahead={la},xfade={xf}",
            "context_samples": sd.window,
            "latency_ms": 1000.0 * sd.latency_samples / sr,
            "packet_ms": 1000.0 * hop / sr,
            "step_ms": 1000.0 * dt, "rtf": rtf,
            "device_step_ms": dev_ms,
            "device_rtf": (hop / sr) / (dev_ms / 1000.0),
        })
        print(rows[-1], flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
