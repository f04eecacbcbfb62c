"""Per-stage wall-clock decomposition of the fused inference graph.

``bench.py`` reports one aggregate roofline for STFT -> U-Net -> iSTFT
(121.9 TFLOP/s = 62% of v5e bf16 peak at batch 1024). This harness answers
*where the other 38% goes*: it times each DoubleConv level, each transposed
conv, and the DSP front/back ends as separately-jitted programs at the exact
shapes the fused graph runs them, and prints measured TFLOP/s per stage next
to its analytic FLOPs. Stages that land far below peak are the optimization
targets (docs/STATUS.md round-4 candidate: the cin=1 stem at full spatial
resolution).

Per-stage numbers are upper bounds on fused cost (a standalone jit pays HBM
round trips for activations that XLA may keep fused in the full graph), so
read them as a *relative* decomposition.

Note: standalone stages hold their full input AND output activations in
HBM (the fused graph shares/fuses those buffers), so the decomposition
OOMs at the bench's batch 1024 on a 16G chip — run at 512 or below.

Usage: python examples/profile_breakdown.py [--batch_size 512] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiodenoiser_tpu.dsp import stft as stft_lib
from audiodenoiser_tpu.models.unet import DoubleConv
from flax import linen as nn


# completion barrier: a host scalar fetch through a separate cached
# program. jax.block_until_ready can return early on the axon relay
# (see eval/bench.py sync()) — measured here as stages "running" at
# 50+ PFLOP/s, i.e. not waiting at all. The probe is a SEPARATE
# dispatch, so XLA cannot dead-code-eliminate the timed computation.
_probe = jax.jit(lambda a: jnp.real(a).ravel()[0])


def _barrier(out):
    return float(_probe(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    # pipelined (no host sync inside the loop), but keep only the LAST
    # output reference: at batch 512 a single stage output is ~2 GB, so
    # retaining all iters of them OOMs the 16G chip. Device streams
    # execute in order, so the last output completing means every queued
    # iteration completed (same pattern as eval/bench.py pipelined mode).
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def conv_flops(b, h, w, cin, cout, k=3):
    return 2 * b * h * w * cin * cout * k * k


# v5e-1 roofline constants (same as eval/bench.py)
PEAK_BF16 = 197e12
HBM_BW = 819e9


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--clip_seconds", type=float, default=2.0)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--fold", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="profile the BN-folded serving stages "
                   "(conv+bias+relu, models/folded.py — the production "
                   "graph); --no-fold profiles live-BN DoubleConv stages")
    args = p.parse_args(argv)

    from audiodenoiser_tpu.utils.backend import require_device
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    require_device(who="profile_breakdown")
    enable_persistent_cache()

    sr, n_fft, hop = 8000, 512, 128
    b = args.batch_size
    n = int(sr * args.clip_seconds)
    f_bins = n_fft // 2 + 1           # 257
    t_frames = 1 + n // hop           # 126 (center=True)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        np.clip(rng.standard_normal((b, n)) * 0.2, -1, 1), jnp.float32
    )

    rows = []

    def record(name, dt, fl, by=0):
        rows.append((name, dt, fl, by))
        print(f"  measured {name}: {dt*1e3:.2f} ms", flush=True)

    # --- DSP front/back ends (pallas path, as the TPU bench runs them) ---
    prec = "pallas" if jax.default_backend() in ("tpu", "axon") else "fft"
    stft_fn = jax.jit(
        lambda x: stft_lib.stft(x, n_fft, hop, center=True, precision=prec)
    )
    spec = stft_fn(audio)
    dt = timed(stft_fn, audio, iters=args.iters)
    # real-DFT as matmul: 2 bases x (2 * frames * n_fft * f_bins)
    record("stft (pallas)", dt, 2 * 2 * b * t_frames * n_fft * f_bins,
           b * (n * 4 + f_bins * t_frames * 8))
    istft_fn = jax.jit(
        lambda s: stft_lib.istft(s, hop, n_fft=n_fft, center=True, length=n,
                                 precision=prec)
    )
    dt = timed(istft_fn, spec, iters=args.iters)
    record("istft (pallas)", dt, 2 * 2 * b * t_frames * n_fft * f_bins,
           b * (n * 4 + f_bins * t_frames * 8))

    # --- U-Net levels at the fused graph's shapes, bf16 like the bench ---
    # every inter-stage glue op is jitted: eager dispatch on the axon
    # backend is a remote compile round-trip per primitive (and can fail
    # outright for ops the eager helper does not cover)
    mag = jax.jit(lambda s: jnp.abs(s)[..., None].astype(jnp.bfloat16))(spec)

    from audiodenoiser_tpu.models import folded as folded_lib

    def dc_stage(name, x, feats):
        h, w, cin = x.shape[1], x.shape[2], x.shape[3]
        if args.fold:
            # the production serving stage (models/folded.py): two
            # conv+bias+relu chains, kernels bf16, biases f32
            r = np.random.default_rng(hash(name) % 2**31)

            def pk(ci, co):
                return {
                    "kernel": jnp.asarray(
                        r.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16
                    ),
                    "bias": jnp.asarray(
                        r.standard_normal((co,)) * 0.05, jnp.float32
                    ),
                }

            params = {"conv0": pk(cin, feats), "conv1": pk(feats, feats)}
            fn = jax.jit(lambda v, y: folded_lib._double(y, v))
        else:
            mod = DoubleConv(feats, dtype=jnp.bfloat16)
            params = mod.init(jax.random.key(0), x[:1], False)
            fn = jax.jit(lambda v, y: mod.apply(v, y, False))
        out = fn(params, x)
        dt = timed(fn, params, x, iters=args.iters)
        fl = conv_flops(b, h, w, cin, feats) + conv_flops(b, h, w, feats, feats)
        # standalone-jit traffic: in + intermediate (write+read) + out
        by = 2 * b * h * w * (cin + 3 * feats)
        record(name, dt, fl, by)
        return out

    def deconv_stage(name, x, feats):
        mod = nn.ConvTranspose(feats, kernel_size=(2, 2), strides=(2, 2),
                               padding="VALID", dtype=jnp.bfloat16,
                               param_dtype=jnp.float32)
        variables = mod.init(jax.random.key(0), x[:1])
        fn = jax.jit(lambda v, y: mod.apply(v, y))
        out = fn(variables, x)
        dt = timed(fn, variables, x, iters=args.iters)
        h, w, cin = x.shape[1], x.shape[2], x.shape[3]
        fl = 2 * b * h * w * cin * feats * 4
        by = 2 * b * h * w * (cin + 4 * feats)
        record(name, dt, fl, by)
        return out

    pool = jax.jit(
        lambda y: nn.max_pool(y, window_shape=(2, 2), strides=(2, 2))
    )

    x = mag
    feats = (64, 128, 256, 512)
    skips = []
    for i, f in enumerate(feats):
        x = dc_stage(f"down{i} DC({x.shape[3]}->{f}) @{x.shape[1]}x{x.shape[2]}",
                     x, f)
        skips.append(x)
        x = pool(x)
    x = dc_stage(f"bottleneck DC(512->1024) @{x.shape[1]}x{x.shape[2]}", x, 1024)
    for i, f in enumerate(reversed(feats)):
        skip = skips.pop()  # release each skip after its concat (down0's
        # skip alone is ~2 GB at batch 512; retaining all four OOMs)
        x = deconv_stage(
            f"up{i} deconv({x.shape[3]}->{f}) @{x.shape[1]}x{x.shape[2]}", x, f
        )
        dy, dx_ = skip.shape[1] - x.shape[1], skip.shape[2] - x.shape[2]
        x = jax.jit(
            lambda a, b: jnp.concatenate(
                [
                    a,
                    jnp.pad(
                        b,
                        ((0, 0), (dy // 2, dy - dy // 2),
                         (dx_ // 2, dx_ - dx_ // 2), (0, 0)),
                    ),
                ],
                axis=-1,
            )
        )(skip, x)
        x = dc_stage(f"up{i} DC({x.shape[3]}->{f}) @{x.shape[1]}x{x.shape[2]}",
                     x, f)

    total = sum(r[1] for r in rows)
    total_fl = sum(r[2] for r in rows)
    print(f"\n{'stage':<44} {'ms':>8} {'%':>6} {'GFLOP':>9} {'TFLOP/s':>9} "
          f"{'%peak':>6} {'SOLms':>7} {'xSOL':>6} {'bound':>5}")
    sol_sum = 0.0
    for name, dt, fl, by in rows:
        t_mxu, t_hbm = fl / PEAK_BF16, by / HBM_BW
        sol = max(t_mxu, t_hbm)
        sol_sum += sol
        bound = "HBM" if t_hbm > t_mxu else "MXU"
        print(f"{name:<44} {dt*1e3:8.2f} {100*dt/total:6.1f} {fl/1e9:9.1f} "
              f"{fl/dt/1e12:9.1f} {100*fl/dt/1e12/PEAK_BF16*1e12:6.1f} "
              f"{sol*1e3:7.2f} {dt/sol:6.2f} {bound:>5}")
    print(f"{'SUM (standalone stages)':<44} {total*1e3:8.2f} {'':>6} "
          f"{total_fl/1e9:9.1f} {total_fl/total/1e12:9.1f} "
          f"{100*total_fl/total/1e12/PEAK_BF16*1e12:6.1f} {sol_sum*1e3:7.2f} "
          f"{total/sol_sum:6.2f}")
    frames = b * t_frames
    print(f"\nspeed-of-light wall (per-stage roofline sum, standalone-jit "
          f"traffic): {sol_sum*1e3:.1f} ms -> {frames/sol_sum:,.0f} frames/s "
          f"ceiling at batch {b}")
    print(f"measured standalone sum: {total*1e3:.1f} ms -> "
          f"{frames/total:,.0f} frames/s ({100*sol_sum/total:.0f}% of SOL); "
          f"the fused graph shares/fuses inter-stage buffers, so its true "
          f"ceiling sits between this and the pure-MXU wall "
          f"{total_fl/PEAK_BF16*1e3:.1f} ms "
          f"({frames/(total_fl/PEAK_BF16):,.0f} frames/s)")


if __name__ == "__main__":
    main()
