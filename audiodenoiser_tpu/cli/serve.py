"""CLI: serve a trained denoiser over HTTP.

Usage:
  python -m audiodenoiser_tpu.cli.serve --noise_type white \
      --saved_models_dir ./saved_models --port 8800

  curl -s -X POST --data-binary @noisy.wav \
      'http://127.0.0.1:8800/denoise?mode=noisy_phase' > denoised.wav
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HTTP denoising service")
    p.add_argument("--noise_type", default="white",
                   choices=["white", "urban", "reverb", "noise_cancellation",
                            "mixed"],
                   help="which specialized checkpoint to serve; 'mixed' "
                   "serves the universal model ({stem}_mixed.ckpt, trained "
                   "with cli.train --noise_type mixed) — the recommended "
                   "one-checkpoint deployment for the mask family.")
    p.add_argument("--saved_models_dir", default="./saved_models")
    p.add_argument("--model", choices=["unet", "complex_mask"], default="unet")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--bucket_seconds", type=float, default=2.0,
                   help="requests are padded to multiples of this many "
                   "seconds so the jit cache stays small")
    p.add_argument("--max_seconds", type=float, default=60.0)
    p.add_argument(
        "--mode", default=None,
        help="default reconstruction mode (noisy_phase unless --model "
        "complex_mask, which implies complex_mask)",
    )
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument(
        "--precision_path", choices=["auto", "pallas", "matmul", "fft"],
        default="auto",
        help="STFT/iSTFT kernel path; auto picks the fused Pallas kernels "
        "on TPU (matching the benchmark) and fft elsewhere.",
    )
    p.add_argument(
        "--mesh", choices=["auto", "on", "off"], default="auto",
        help="auto: shard micro-batches over a ('data','model') device "
        "mesh iff >1 device is visible; on: force; off: single device.",
    )
    p.add_argument(
        "--model_parallel", type=int, default=1,
        help="channel-TP degree on the device mesh.",
    )
    p.add_argument(
        "--no_warmup", action="store_true",
        help="skip pre-compiling the first-bucket programs at startup "
        "(first requests then pay the cold XLA compile).",
    )
    p.add_argument(
        "--auto_route", action="store_true",
        help="load all 4 specialists plus the trained noise router and "
        "serve mode=auto: each request batch is classified on-device and "
        "dispatched to the predicted specialist (requires "
        "noise_router.ckpt; see cli.train --model router).",
    )
    p.add_argument(
        "--stream_latency_ms", type=float, default=None,
        help="serve /stream sessions with the look-ahead-bounded "
        "low-latency engine at this end-to-end latency budget (e.g. 224) "
        "instead of the default WOLA sessions whose latency is one full "
        "chunk (bucket_seconds). The model still sees a full 2 s rolling "
        "context; compute rises as context/hop (docs/LATENCY.md). "
        "Routed (mode=auto) streams keep WOLA.",
    )
    p.add_argument(
        "--stream_pool", type=str, default=None, metavar="N|auto",
        help="serve /stream sessions from a shared MultiStreamWola pool of "
        "this capacity: all live streams advance in ONE device dispatch "
        "per hop period instead of one dispatch per stream (per-chip "
        "stream capacity scales with the chip's batched-throughput "
        "headroom). Size it to the expected concurrency: every tick "
        "computes the FULL capacity-sized batch, so a much-oversized "
        "pool wastes compute when only a few streams are live. 'auto' "
        "sizes the pool to the device HBM budget from XLA's compiled "
        "memory analysis (eval.streaming.auto_pool_capacity). WOLA "
        "sessions only (not --stream_latency_ms or mode=auto routed "
        "streams).",
    )
    p.add_argument(
        "--fold", action="store_true",
        help="fold eval-mode BatchNorm into the conv kernels at load time "
        "(models/folded.py): the compiled serving graphs contain only "
        "conv+bias+relu chains. Exact in exact arithmetic; applies to the "
        "primary model and every auto-route specialist, and survives "
        "/admin/reload.",
    )
    p.add_argument(
        "--bypass_db", type=float, default=None,
        help="identity-bypass gate: clips whose relative model-change "
        "energy is below -bypass_db are returned verbatim (bit-exact "
        "pass-through of clips the model judged clean; 40 is the eval "
        "default). Off unless set; <=0 disables.",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # flag validation BEFORE the backend/model load so misconfiguration
    # fails in milliseconds, not after a 20 s device init
    if args.stream_pool is not None:
        if args.stream_pool != "auto":
            try:
                args.stream_pool = int(args.stream_pool)
            except ValueError:
                raise SystemExit("--stream_pool must be an integer or 'auto'")
            if args.stream_pool < 1:
                raise SystemExit("--stream_pool must be >= 1")
        if args.stream_latency_ms is not None:
            raise SystemExit(
                "--stream_pool supports WOLA sessions only (drop "
                "--stream_latency_ms)"
            )
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(who="serve")

    import jax
    import jax.numpy as jnp

    from audiodenoiser_tpu.eval.runner import DenoiserRunner, load_model_for_noise
    from audiodenoiser_tpu.serve import DenoiseService, make_http_server

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    stem = "mask_denoiser" if args.model == "complex_mask" else "unet_denoiser"
    # mirror eval/bench.py: serving uses the fused Pallas STFT/iSTFT on TPU
    # (bucketed clips are short, so the kernels fit VMEM)
    if args.precision_path == "auto":
        path = "pallas" if jax.default_backend() == "tpu" else "fft"
    else:
        path = args.precision_path
    use_mesh = {"auto": None, "on": True, "off": False}[args.mesh]
    if use_mesh is None:
        use_mesh = jax.device_count() > 1 or args.model_parallel > 1
    mesh = None
    if use_mesh:
        from audiodenoiser_tpu.parallel import make_mesh

        mesh = make_mesh(model_parallel=max(1, args.model_parallel))
        print(f"Device mesh: {dict(mesh.shape)}")
    chunk = int(args.bucket_seconds * args.sample_rate)
    chunk -= chunk % 2  # WOLA needs an even chunk
    stream_mode = (
        "complex_mask" if args.model == "complex_mask" else "noisy_phase"
    )

    def build_generation() -> dict:
        """Load the current checkpoints and build every runner a serving
        generation needs. Called once at startup and again by each
        ``POST /admin/reload`` — the sidecar-driven loaders mean even an
        architecture change (width_mult, attn_bottleneck, mask head) hot-
        swaps correctly."""
        model, variables = load_model_for_noise(
            args.noise_type, args.saved_models_dir, dtype=dtype, stem=stem
        )
        if args.fold:
            from audiodenoiser_tpu.models import fold_runner_inputs

            model, variables = fold_runner_inputs(model, variables)
        runner = DenoiserRunner(model, variables, precision=path, mesh=mesh)
        router = expert_runners = mixture = None
        auto_expert_mode = "noisy_phase"
        if args.auto_route:
            from audiodenoiser_tpu.eval.ensemble import load_mixture
            from audiodenoiser_tpu.models.router import NOISE_CLASSES

            mixture = load_mixture(args.saved_models_dir, dtype=dtype,
                                   stem=stem)
            router = (mixture.router_model, mixture.router_params,
                      mixture.router_window)
            expert_runners = {
                i: DenoiserRunner(
                    mixture.expert_models[i], mixture.expert_vars[i],
                    precision=path, mesh=mesh,
                )
                for i in range(len(NOISE_CLASSES))
            }
            if args.model == "complex_mask":
                auto_expert_mode = "complex_mask"
            print(f"Auto-routing over {stem} specialists: "
                  f"{', '.join(NOISE_CLASSES)}")
        # chunked low-latency streaming sessions (POST /stream/start|{id}):
        # one shared StreamingDenoiser so sessions reuse compiled graphs
        from audiodenoiser_tpu.eval.streaming import (
            LowLatencyStreamingDenoiser,
            StreamingDenoiser,
        )

        if args.stream_latency_ms is not None:
            streamer = LowLatencyStreamingDenoiser.from_latency_budget(
                runner, args.stream_latency_ms, sample_rate=args.sample_rate,
                window_samples=chunk, mode=stream_mode,
            )
        else:
            streamer = StreamingDenoiser(
                runner, chunk_samples=chunk, sample_rate=args.sample_rate,
                mode=stream_mode,
            )
        pooled = None
        if args.stream_pool is not None:
            from audiodenoiser_tpu.eval.streaming import (
                MultiStreamWola,
                PooledStreamSessions,
                auto_pool_capacity,
            )

            capacity = args.stream_pool
            if capacity == "auto":
                capacity = auto_pool_capacity(
                    runner, chunk_samples=chunk, mode=stream_mode
                )
                print(f"--stream_pool auto: sized pool to {capacity} streams")
            pooled = PooledStreamSessions(
                MultiStreamWola(
                    runner, capacity=capacity, chunk_samples=chunk,
                    sample_rate=args.sample_rate, mode=stream_mode,
                )
            )
        return {
            "runner": runner, "router": router,
            "expert_runners": expert_runners, "mixture": mixture,
            "auto_expert_mode": auto_expert_mode,
            "streamer": streamer, "pooled": pooled,
        }

    gen = {"cur": build_generation()}
    g0 = gen["cur"]
    g0["gen"] = 0  # generation stamp: sessions report the checkpoint
    # generation they were built from (atomic with the snapshot)
    default_mode = args.mode or (
        "auto" if args.auto_route
        else "complex_mask" if args.model == "complex_mask"
        else "noisy_phase"
    )
    if not args.no_warmup:
        print("Warming up (pre-compiling first-bucket programs)...")
    service = DenoiseService(
        g0["runner"],
        sample_rate=args.sample_rate,
        bucket_samples=int(args.bucket_seconds * args.sample_rate),
        max_seconds=args.max_seconds,
        default_mode=default_mode,
        warmup=not args.no_warmup,
        router=g0["router"],
        expert_runners=g0["expert_runners"],
        auto_expert_mode=g0["auto_expert_mode"],
        bypass_db=args.bypass_db,
    )
    from audiodenoiser_tpu.eval.streaming import RoutedStreamingSession

    def stream_factory(mode):
        cur = gen["cur"]  # ONE atomic snapshot: the session AND its
        # generation stamp come from the same dict, so a concurrent
        # reload can never mis-attribute a session (open sessions keep
        # their generation; new sessions always bind the latest one)
        if cur["mixture"] is not None and mode in (None, "auto"):
            return RoutedStreamingSession(
                cur["mixture"], chunk_samples=chunk,
                sample_rate=args.sample_rate, precision=path,
            ), cur["gen"]
        if cur["pooled"] is not None:
            # IndexError when full -> 503
            return cur["pooled"].session(), cur["gen"]
        return cur["streamer"].session(), cur["gen"]

    import threading

    reload_lock = threading.Lock()

    def reload_fn():
        # build (and pre-compile) the new generation BEFORE swapping so a
        # broken checkpoint directory can never take down live serving
        with reload_lock:
            g2 = build_generation()
            n = service.reload(
                runner=g2["runner"], expert_runners=g2["expert_runners"],
                router=g2["router"], warmup=not args.no_warmup,
            )
            g2["gen"] = n
            gen["cur"] = g2
            print(f"Reloaded checkpoints from {args.saved_models_dir} "
                  f"(generation {n})")
            return {"generation": n,
                    "saved_models_dir": args.saved_models_dir}

    server = make_http_server(
        service, args.host, args.port, stream_factory=stream_factory,
        reload_fn=reload_fn,
    )
    stream_desc = (
        f"low-latency "
        f"{g0['streamer'].latency_samples * 1000 // args.sample_rate} ms"
        if args.stream_latency_ms is not None
        else f"WOLA chunk={chunk}"
    )
    print(
        f"Serving {stem}_{args.noise_type} on http://{args.host}:{args.port} "
        f"(mode={default_mode}, streaming {stream_desc})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
