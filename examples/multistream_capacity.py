"""Per-chip stream capacity: pooled vs independent real-time sessions.

N concurrent real-time streams served as N independent
``StreamingSession``s pay N device dispatches per hop; the
``MultiStreamWola`` pool advances all N in ONE dispatch. This harness
feeds N streams in lockstep (one hop per stream per tick, the steady
real-time pattern) and reports the aggregate real-time factor — total
seconds of audio denoised per wall second — for both serving layouts,
optionally at a compact student width (``--width_mult``). Aggregate
RTF / N > 1 means the chip keeps up with N live streams.

Usage: python examples/multistream_capacity.py [--streams 8] [--width_mult 1.0]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from audiodenoiser_tpu.eval.runner import DenoiserRunner
from audiodenoiser_tpu.eval.streaming import MultiStreamWola, StreamingDenoiser
from audiodenoiser_tpu.models.unet import UNet
from audiodenoiser_tpu.train.loop import create_train_state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16000)
    ap.add_argument("--sample_rate", type=int, default=8000)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--width_mult", type=float, default=1.0)
    ap.add_argument(
        "--layouts", default="pooled,independent",
        help="comma list of serving layouts to measure. At 32+ streams the "
        "independent layout is dispatch-bound far below realtime (32 "
        "streams: 1067 ms/tick, per-stream RTF 0.94) and takes ~N*dispatch "
        "per tick — skip it at large N with --layouts pooled.",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    sr, hop = args.sample_rate, args.chunk // 2

    from audiodenoiser_tpu.models.unet import width_kwargs

    model = UNet(**width_kwargs(args.width_mult))
    state = create_train_state(
        jax.random.key(0), model, input_shape=(1, 256, 64, 1)
    )
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )

    rng = np.random.default_rng(0)
    packets = [
        np.clip(rng.standard_normal(hop) * 0.2, -1, 1).astype(np.float32)
        for _ in range(args.streams)
    ]

    def run_pool():
        pool = MultiStreamWola(
            runner, capacity=args.streams, chunk_samples=args.chunk,
            sample_rate=sr,
        )
        slots = [pool.open() for _ in range(args.streams)]
        feed = {s: p for s, p in zip(slots, packets)}
        for _ in range(3):
            pool.process(feed)  # prime + compile
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            pool.process(feed)
        return (time.perf_counter() - t0) / args.ticks

    def run_independent():
        sessions = [
            StreamingDenoiser(
                runner, chunk_samples=args.chunk, sample_rate=sr
            ).session()
            for _ in range(args.streams)
        ]
        for _ in range(3):
            for sess, p in zip(sessions, packets):
                sess.process(p)
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            for sess, p in zip(sessions, packets):
                sess.process(p)
        return (time.perf_counter() - t0) / args.ticks

    audio_per_tick = args.streams * hop / sr
    layouts = {"pooled": run_pool, "independent": run_independent}
    chosen = [s.strip() for s in args.layouts.split(",") if s.strip()]
    unknown = [s for s in chosen if s not in layouts]
    if unknown:
        raise SystemExit(f"unknown --layouts entries: {unknown}")
    rows = {
        "config": {
            "streams": args.streams, "chunk": args.chunk,
            "width_mult": args.width_mult, "sample_rate": sr,
        }
    }

    def flush():
        # write after EVERY layout: a timeout mid-measurement (the
        # independent layout at 64 streams exceeds any sane budget)
        # must not discard the rows already measured
        if args.out:
            with open(args.out, "w") as f:
                json.dump(rows, f, indent=2)

    flush()
    for name in chosen:
        dt = layouts[name]()
        rows[name] = {
            "tick_wall_ms": 1000 * dt,
            "aggregate_rtf": audio_per_tick / dt,
            "per_stream_rtf": audio_per_tick / dt / args.streams,
        }
        print(name, json.dumps(rows[name]), flush=True)
        flush()
    if "pooled" in rows and "independent" in rows:
        print(
            f"pooled speedup over independent: "
            f"{rows['independent']['tick_wall_ms'] / rows['pooled']['tick_wall_ms']:.2f}x"
        )
    if args.out:
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
