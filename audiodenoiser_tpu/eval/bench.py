"""Headline benchmark core (packaged): end-to-end STFT -> U-Net denoise -> iSTFT throughput.

Measures spectrogram frames/sec/chip through the fused inference graph
(waveform in, denoised waveform out, single XLA program) on the flagship
31M-parameter U-Net in bfloat16 — the BASELINE.json north-star metric with
its >=10k frames/s/chip target on v5e-1.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio to the 10k frames/s target (the reference itself
publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time


def run_bench(batch_size: int = 256, clip_seconds: float = 2.0, iters: int = 20,
              warmup: int = 3, mode: str = "noisy_phase",
              pipelined: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.models import UNet

    sr, hop, n_fft = 8000, 128, 512
    n_samples = int(sr * clip_seconds)
    if mode == "complex_mask":
        from audiodenoiser_tpu.models import ComplexMaskUNet

        model = ComplexMaskUNet(dtype=jnp.bfloat16)
        in_ch = 3
    else:
        model = UNet(dtype=jnp.bfloat16)
        in_ch = 1
    from audiodenoiser_tpu.train.loop import init_variables

    variables = init_variables(model, jax.random.key(0), (1, 64, 64, in_ch))
    precision = "pallas" if jax.default_backend() == "tpu" else "fft"
    runner = DenoiserRunner(
        model, variables, n_fft=n_fft, hop_length=hop, precision=precision
    )

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        np.clip(rng.standard_normal((batch_size, n_samples)) * 0.2, -1, 1),
        jnp.float32,
    )
    key = jax.random.key(1)

    def sync(out):
        # a host scalar fetch is the reliable completion barrier on the
        # axon relay (block_until_ready can return early for aliased
        # buffers); for fresh outputs both agree within noise.
        return float(out[(0,) * out.ndim])

    for _ in range(warmup):
        sync(runner.denoise_audio(audio, key, mode=mode))
    t0 = time.perf_counter()
    if pipelined:
        # steady-state serving throughput: keep the device queue full,
        # one barrier at the end
        outs = [runner.denoise_audio(audio, key, mode=mode) for _ in range(iters)]
        for o in outs:
            sync(o)
    else:
        # per-batch latency: barrier every iteration
        for _ in range(iters):
            sync(runner.denoise_audio(audio, key, mode=mode))
    dt = time.perf_counter() - t0

    frames_per_clip = 1 + n_samples // hop  # center=True STFT frames
    frames = batch_size * frames_per_clip * iters
    fps = frames / dt
    return {
        "metric": "spectrogram_frames_per_sec_per_chip (STFT->UNet->iSTFT fused)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 10000.0, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--clip_seconds", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", default="noisy_phase",
                   choices=["noisy_phase", "griffin_lim", "reference_gl",
                            "complex_mask"])
    p.add_argument("--latency", action="store_true",
                   help="measure per-batch latency (barrier every iteration) "
                   "instead of pipelined serving throughput")
    args = p.parse_args(argv)
    result = run_bench(args.batch_size, args.clip_seconds, args.iters,
                       mode=args.mode, pipelined=not args.latency)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
