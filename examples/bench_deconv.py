"""A/B microbenchmark: XLA ConvTranspose lowering vs the Pallas kernel.

Times each of the four decoder deconv shapes of the fused inference graph
(batch x {16x4x1024->512, 32x8x512->256, 64x16x256->128, 128x32x128->64})
through both lowerings:

  xla    — flax.linen.ConvTranspose(k=(2,2), s=(2,2), VALID), what the
           fused graph ships today (models/unet.py)
  pallas — ops/pallas/deconv_kernel.conv_transpose_2x2: four sub-pixel
           MXU matmuls interleaved in VMEM

The earlier XLA-level rewrite (per-pixel matmul + depth-to-space) measured
0.63-0.89x — the interleave round-tripped HBM (docs/STATUS.md negative
results). This kernel keeps the interleave in VMEM; this harness decides
whether that flips the sign.

Usage: python examples/bench_deconv.py [--batch_size 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiodenoiser_tpu.ops.pallas.deconv_kernel import conv_transpose_2x2

# completion barrier: host scalar fetch via a separate cached program
# (block_until_ready can return early on the axon relay; see
# eval/bench.py sync()).
_probe = jax.jit(lambda a: jnp.real(a).ravel()[0])


def _barrier(out):
    return float(_probe(out))


def timed(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args(argv)
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch_size
    rng = np.random.default_rng(0)
    # decoder shapes for the (256, 64) training/serving spectrogram
    shapes = [
        (16, 4, 1024, 512),
        (32, 8, 512, 256),
        (64, 16, 256, 128),
        (128, 32, 128, 64),
    ]
    peak = 197e12  # v5e bf16 dense peak
    print(f"{'shape':<28} {'xla ms':>8} {'pallas ms':>10} {'speedup':>8} "
          f"{'xla %pk':>8} {'pallas %pk':>10}")
    tot_x = tot_p = 0.0
    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dtype)
        k = jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.05,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        mod = nn.ConvTranspose(cout, kernel_size=(2, 2), strides=(2, 2),
                               padding="VALID", dtype=dtype,
                               param_dtype=jnp.float32)

        @jax.jit
        def f_xla(x, k=k, bias=bias, mod=mod):
            return mod.apply({"params": {"kernel": k, "bias": bias}}, x)

        f_pal = jax.jit(functools.partial(
            conv_transpose_2x2, interpret=jax.default_backend() == "cpu"))
        # parity on-device before timing (small batch: at 1024 holding two
        # f32 copies of an up-path output exceeds HBM)
        x8 = x[:8]
        err = float(jnp.max(jnp.abs(f_xla(x8).astype(jnp.float32)
                                    - f_pal(x8, k, bias)
                                    .astype(jnp.float32))))
        dt_x = timed(f_xla, x, iters=args.iters)
        dt_p = timed(f_pal, x, k, bias, iters=args.iters)
        fl = 2 * b * h * w * 4 * cin * cout
        tot_x += dt_x
        tot_p += dt_p
        print(f"{h}x{w}x{cin}->{cout:<10} {dt_x*1e3:8.3f} {dt_p*1e3:10.3f} "
              f"{dt_x/dt_p:8.2f}x {fl/dt_x/peak*100:8.1f} "
              f"{fl/dt_p/peak*100:10.1f}  (max err {err:.3e})")
    print(f"{'TOTAL (4 deconvs)':<28} {tot_x*1e3:8.3f} {tot_p*1e3:10.3f} "
          f"{tot_x/tot_p:8.2f}x")


if __name__ == "__main__":
    main()
