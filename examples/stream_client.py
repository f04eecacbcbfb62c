"""Minimal client for the chunked HTTP streaming API (serve/server.py).

Feeds a wav file to a running ``adt-serve`` instance in real-time-sized
packets and writes the denoised stream back out — the low-latency path a
live caller (VoIP gateway, broadcast chain) would use instead of the
batch ``POST /denoise`` endpoint.

Usage:
  python -m audiodenoiser_tpu.cli.serve --port 8800 &   # start the server
  python examples/stream_client.py noisy.wav denoised.wav \
      --url http://127.0.0.1:8800 --packet_ms 128
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

import numpy as np


def post(url: str, data: bytes = b"") -> bytes:
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.read()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--url", default="http://127.0.0.1:8800")
    p.add_argument("--packet_ms", type=float, default=128.0)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument(
        "--realtime", action="store_true",
        help="pace packets at wall-clock speed (simulates a live source)",
    )
    args = p.parse_args()

    from audiodenoiser_tpu.data.wav_io import read_wav, write_wav

    audio, sr = read_wav(args.infile, sample_rate=args.sample_rate)
    info = json.loads(post(f"{args.url}/stream/start"))
    sid = info["session"]
    packet = max(1, int(args.sample_rate * args.packet_ms / 1e3))
    print(
        f"session {sid}: latency budget {info['latency_samples']} samples "
        f"({1e3 * info['latency_samples'] / args.sample_rate:.0f} ms), "
        f"packets of {packet} samples"
    )

    out = []
    t0 = time.perf_counter()
    for off in range(0, len(audio), packet):
        piece = audio[off : off + packet].astype("<f4")
        if args.realtime:
            target = off / args.sample_rate
            lag = target - (time.perf_counter() - t0)
            if lag > 0:
                time.sleep(lag)
        got = post(f"{args.url}/stream/{sid}", piece.tobytes())
        out.append(np.frombuffer(got, "<f4"))
    out.append(np.frombuffer(post(f"{args.url}/stream/{sid}/flush"), "<f4"))
    dt = time.perf_counter() - t0
    y = np.concatenate(out)[: len(audio)]
    write_wav(args.outfile, y, args.sample_rate)
    dur = len(audio) / args.sample_rate
    print(
        f"streamed {dur:.1f}s of audio in {dt:.1f}s "
        f"({dur / dt:.1f}x realtime) -> {args.outfile}"
    )


if __name__ == "__main__":
    sys.exit(main())
