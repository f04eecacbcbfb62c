"""Measure denoising quality at each streaming latency budget (docs/LATENCY.md).

Corrupts the synthetic test library with all four reference corruption
types (`create_train_dataset.py:105-159` semantics via dsp/noise.py), then
denoises every clip through each streaming configuration with a trained
universal mask model and reports mean SI-SDR. The point of the comparison:
WOLA's model context shrinks with its latency (the chunk IS the window),
while the low-latency engine holds the full 2 s training-scale context at
any budget — so its quality should track the offline upper bound.

Usage:
  python examples/measure_latency_quality.py \
      --data_root ./data_src/data/test --saved_models_dir ./saved_models \
      [--out docs/latency_quality.json]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from audiodenoiser_tpu.data.wav_io import load_wav_list, read_wav  # noqa: E402
from audiodenoiser_tpu.dsp.noise import add_noise  # noqa: E402
from audiodenoiser_tpu.eval.metrics import si_sdr  # noqa: E402
from audiodenoiser_tpu.eval.runner import (  # noqa: E402
    DenoiserRunner,
    load_model_for_noise,
)
from audiodenoiser_tpu.eval.streaming import (  # noqa: E402
    LowLatencyStreamingDenoiser,
    StreamingDenoiser,
)

NOISE_TYPES = ("white", "urban", "reverb", "noise_cancellation")


def stream_denoise(sd, x: np.ndarray) -> np.ndarray:
    """Run x through a fresh session, feeding 8-hop packets (one
    power-of-two bucket per dispatch, keeping the compile cache small)."""
    sess = sd.session()
    packet = 8 * sd.hop
    outs = [
        sess.process(x[i: i + packet]) for i in range(0, len(x), packet)
    ]
    outs.append(sess.flush())
    y = np.concatenate(outs)
    return y[: len(x)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="./data_src/data/test")
    ap.add_argument("--saved_models_dir", default="./saved_models")
    ap.add_argument("--noise_type", default="mixed",
                    help="which checkpoint to load (mixed = universal)")
    ap.add_argument("--stem", default="mask_denoiser")
    ap.add_argument("--mode", default="complex_mask")
    ap.add_argument("--sample_rate", type=int, default=8000)
    ap.add_argument(
        "--ll_configs",
        default="4096,1024,512;2048,512,256;1024,512,256;512,256,128",
        help="semicolon-separated hop,lookahead,xfade triples",
    )
    ap.add_argument("--skip_wola", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    sr = args.sample_rate

    model, variables = load_model_for_noise(
        args.noise_type, args.saved_models_dir, stem=args.stem
    )
    runner = DenoiserRunner(model, variables)

    clean_paths = load_wav_list(f"{args.data_root}/clean")
    noise_paths = load_wav_list(f"{args.data_root}/noise")
    cleans = [read_wav(p, sr)[0] for p in clean_paths]
    noises = [read_wav(p, sr)[0] for p in noise_paths]

    # corrupt: one (clip, type) pair per clip per corruption
    pairs = []  # (clean np, noisy np)
    for i, c in enumerate(cleans):
        c = jnp.asarray(c)
        for j, nt in enumerate(NOISE_TYPES):
            key = jax.random.key(1000 * i + j)
            nclip = jnp.asarray(noises[(i + j) % len(noises)])
            noisy = add_noise(key, c, nt, noise_clip=nclip, sample_rate=sr)
            pairs.append((np.asarray(c), np.asarray(noisy)))

    def mean_si_sdr(denoise_fn) -> float:
        vals = [
            float(si_sdr(jnp.asarray(denoise_fn(noisy)), jnp.asarray(clean)))
            for clean, noisy in pairs
        ]
        return float(np.mean(vals))

    rows = []

    def record(engine, config, latency_ms, fn):
        v = mean_si_sdr(fn)
        rows.append({"engine": engine, "config": config,
                     "latency_ms": latency_ms, "si_sdr_db": v})
        print(rows[-1], flush=True)

    record("input", "noisy (no denoising)", 0, lambda x: x)
    record(
        "offline", "whole-clip fused graph", None,
        lambda x: np.asarray(runner.denoise_audio(
            jnp.asarray(x)[None], jax.random.key(0), mode=args.mode
        )[0]),
    )
    if not args.skip_wola:
        for chunk in (16000, 8000, 4000, 2048):
            sd = StreamingDenoiser(
                runner, chunk_samples=chunk, sample_rate=sr, mode=args.mode
            )
            record("wola", f"chunk={chunk}", 1000.0 * chunk / sr,
                   lambda x, sd=sd: stream_denoise(sd, x))
    ll_configs = [
        tuple(int(v) for v in c.split(","))
        for c in args.ll_configs.split(";") if c
    ]
    for hop, la, xf in ll_configs:
        sd = LowLatencyStreamingDenoiser(
            runner, window_samples=16000, hop_samples=hop,
            lookahead_samples=la, xfade_samples=xf, sample_rate=sr,
            mode=args.mode,
        )
        record("low_latency", f"hop={hop},lookahead={la},xfade={xf}",
               1000.0 * sd.latency_samples / sr,
               lambda x, sd=sd: stream_denoise(sd, x))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
