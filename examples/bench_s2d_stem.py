"""Throughput A/B: plain full-resolution stem vs space-to-depth stem.

The fused-graph roofline (docs/STATUS.md, examples/profile_breakdown.py)
pins the residual bottleneck on the HBM-bound full-resolution level-0
layers: the cin=1 stem writes a (B, 256, 64, 64) bf16 activation and the
decoder's last level reads/writes the same full-res grid twice more.
``UNet(s2d_stem=True)`` (models/unet.py) runs that whole level at half
spatial resolution — 4x fewer level-0 activation bytes — and restores
full resolution with a sub-pixel 1x1 head.

This harness times BOTH variants through the identical fused
STFT -> U-Net -> iSTFT serving graph (BN-folded, the production config)
at the bench shapes, printing frames/s and the XLA cost-model roofline
for each. Throughput only: quality of the variant must be established by
training (the stem is an architecture change, not checkpoint-convertible).

Usage: python examples/bench_s2d_stem.py [--batch_size 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time


def measure(s2d: bool, batch_size: int, iters: int, warmup: int,
            s2d_skip: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.models import UNet, fold_runner_inputs
    from audiodenoiser_tpu.train.loop import init_variables

    sr, hop, n_fft = 8000, 128, 512
    n_samples = sr * 2
    model = UNet(dtype=jnp.bfloat16, s2d_stem=s2d, s2d_skip=s2d_skip)
    variables = init_variables(model, jax.random.key(0), (1, 64, 64, 1))
    model, variables = fold_runner_inputs(model, variables)
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

    flops = hbm = None
    try:
        cost = (
            runner._denoise_audio.lower(runner, audio, key, mode="noisy_phase")
            .compile()
            .cost_analysis()
        )
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
            hbm = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    def sync(out):
        return float(out[(0,) * out.ndim])

    for _ in range(warmup):
        sync(runner.denoise_audio(audio, key, mode="noisy_phase"))
    t0 = time.perf_counter()
    outs = [
        runner.denoise_audio(audio, key, mode="noisy_phase")
        for _ in range(iters)
    ]
    for o in outs:
        sync(o)
    dt = time.perf_counter() - t0

    frames = batch_size * (1 + n_samples // hop) * iters
    row = {
        "variant": (f"s2d_stem+skip{s2d_skip}" if s2d and s2d_skip
                    else "s2d_stem" if s2d else "plain"),
        "frames_per_sec": round(frames / dt, 1),
    }
    if flops is not None:
        row["tflops_per_sec"] = round(flops * iters / dt / 1e12, 2)
        row["pct_bf16_peak"] = round(100 * flops * iters / dt / 1e12 / 197, 1)
        row["graph_tflop"] = round(flops / 1e12, 3)
    if hbm is not None:
        row["hbm_gb_per_sec"] = round(hbm * iters / dt / 1e9, 1)
        row["graph_gb"] = round(hbm / 1e9, 3)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--s2d_skip", type=int, default=0,
                   help="also measure the full-res refinement tier "
                   "(UNet s2d_skip=K) as a third row")
    args = p.parse_args(argv)

    from audiodenoiser_tpu.utils.backend import require_device
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    require_device(who="bench_s2d_stem")
    enable_persistent_cache()

    rows = [
        measure(False, args.batch_size, args.iters, args.warmup),
        measure(True, args.batch_size, args.iters, args.warmup),
    ]
    if args.s2d_skip:
        rows.append(measure(True, args.batch_size, args.iters, args.warmup,
                            s2d_skip=args.s2d_skip))
    for r in rows:
        print(json.dumps(r))
    speedup = rows[1]["frames_per_sec"] / rows[0]["frames_per_sec"]
    print(f"s2d_stem speedup: {speedup:.3f}x")


if __name__ == "__main__":
    main()
