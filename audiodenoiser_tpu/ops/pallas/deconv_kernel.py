"""Pallas TPU kernel: 2x2-stride-2 transposed convolution (U-Net upsampling).

The decoder's four ``nn.ConvTranspose(kernel=(2,2), strides=(2,2))`` layers
(the TPU-native analog of the reference's ``ConvTranspose2d(k=2, s=2)``
upsampling, ``/root/reference/code/model.py:38``) are the least efficient
stages of the fused inference graph: XLA's deconv lowering runs at 7-16% of
the v5e bf16 peak (``examples/profile_breakdown.py``) while the surrounding
DoubleConvs hit 36-72%. Rewriting the deconv as per-pixel matmul +
depth-to-space at the XLA level was measured *slower* (0.63-0.89x — the
reshape/transpose round-trips HBM; see docs/STATUS.md "negative results").

This kernel keeps that same algebra but performs the interleave entirely in
VMEM. With stride 2 and a 2x2 kernel every output pixel receives exactly one
input tap:

  out[b, 2i+di, 2j+dj, :] = x[b, i, j, :] @ W[1-di, 1-dj] + bias

(the spatial flip matches ``flax.linen.ConvTranspose``'s
``lax.conv_transpose(transpose_kernel=False)`` semantics, which the
imported reference ``.pth`` weights are converted into —
``train/torch_import.py``),

so per input tile the kernel runs four MXU matmuls (one per (di, dj)
sub-pixel position) and interleaves the four results with VMEM-local
concat+reshape (sub-pixel axes inserted next to their spatial axes, then
merged) into the (TB, 2*TH, 2*W, C) output tile. One HBM read of x, one
HBM write of out, zero HBM traffic for the relayout.

Exposed through ``models.unet.UNet(pallas_deconv=True)``; exactness vs
``flax.linen.ConvTranspose`` is asserted in ``tests/test_pallas.py``
(interpret mode on CPU, compiled on TPU). Backward (training) falls back to
the XLA gradient via ``jax.custom_vjp``: dx is a plain stride-2 conv and dW
a correlation, both shapes XLA already lowers well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_vmem_bytes(tb: int, th: int, w: int, cin: int, cout: int,
                     itemsize: int) -> int:
    """Estimated per-step VMEM: double-buffered x/out tiles, the resident
    weight block, and the four f32 matmul results live before the cast."""
    x_tile = tb * th * w * cin * itemsize
    out_tile = tb * 2 * th * 2 * w * cout * itemsize
    weights = 4 * cin * cout * itemsize
    y_f32 = 4 * tb * th * w * cout * 4
    return 2 * x_tile + 2 * out_tile + weights + y_f32


def _pick_tiles(b: int, h: int, w: int, cin: int, cout: int,
                itemsize: int) -> tuple[int, int]:
    """(TB, TH): batch/row tile sizes.

    Targets ~256-2048 matmul rows per step, then shrinks the row tile
    until the estimated VMEM footprint fits the ~16 MB/core budget (the
    eval-shape W=7 up0 tile overflowed scoped vmem by 148 KB at the
    original target — measured round 3). H is a power of two at every
    U-Net stage, so divisor search terminates quickly.
    """
    tb = min(8, b)
    # conservative rows-per-step target: the 4 MB-scratch variant hit the
    # 16 MB scoped-vmem ceiling at the odd eval widths (Mosaic's sublane
    # padding of the 5-D interleave intermediates isn't modeled here)
    m_target = max(256, min(2048, (2 * 1024 * 1024 // 16) // max(cout, 1)))
    th = max(1, m_target // max(tb * w, 1))
    while h % th:
        th -= 1
    budget = 10 * 1024 * 1024  # leave headroom under the 16 MB scoped limit
    while th > 1 and _tile_vmem_bytes(tb, th, w, cin, cout, itemsize) > budget:
        th -= 1
        while h % th:
            th -= 1
    while (tb > 1
           and _tile_vmem_bytes(tb, th, w, cin, cout, itemsize) > budget):
        tb //= 2
    return tb, th


def _deconv_kernel(x_ref, w_ref, b_ref, out_ref, *, compute_dtype):
    tb, th, w, cin = x_ref.shape
    cout = out_ref.shape[-1]
    xf = x_ref[:].reshape(tb * th * w, cin)
    # One MXU matmul per sub-pixel position k = di*2 + dj; accumulate f32
    # on the MXU, then add bias and round to the compute dtype BEFORE the
    # interleave so the VMEM relayout shuffles half the bytes.
    ys = [
        (jnp.dot(xf, w_ref[k], preferred_element_type=jnp.float32)
         + b_ref[0].astype(jnp.float32))
        .reshape(tb, th, w, 1, cout)
        .astype(compute_dtype)  # cast after the 5-D reshape: Mosaic has no
        # bf16 (M, C) -> 5-D reshape, and casting here still keeps the
        # concat relayout at half the bytes
        for k in range(4)
    ]
    # Interleave dj along width, then di along height; the reshapes merge
    # (w, 2) -> 2w and (th, 2) -> 2th so out[2i+di, 2j+dj] = ys[di*2+dj][i, j].
    row0 = jnp.concatenate(ys[0:2], axis=3).reshape(tb, th, 1, 2 * w, cout)
    row1 = jnp.concatenate(ys[2:4], axis=3).reshape(tb, th, 1, 2 * w, cout)
    out_ref[:] = jnp.concatenate([row0, row1], axis=2).reshape(
        tb, 2 * th, 2 * w, cout
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_transpose_2x2(x, kernel, bias, interpret=False):
    """ConvTranspose(k=(2,2), s=(2,2), VALID) — NHWC in, NHWC out.

    ``kernel`` is the flax ConvTranspose layout (2, 2, Cin, Cout); output is
    (B, 2H, 2W, Cout) in ``x.dtype``.
    """
    return _forward(x, kernel, bias, interpret)


def _forward(x, kernel, bias, interpret):
    if x.ndim != 4 or kernel.shape[:2] != (2, 2):
        raise ValueError(f"expected NHWC x and (2,2,Cin,Cout) kernel, got "
                         f"{x.shape} / {kernel.shape}")
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dtype = x.dtype
    tb, th = _pick_tiles(b, h, w, cin, cout, jnp.dtype(dtype).itemsize)
    b_pad = _round_up(b, tb)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    # flax ConvTranspose applies the spatially flipped kernel (see module
    # docstring); flip here so w_ref[di*2+dj] is the tap for sub-pixel
    # (di, dj).
    wmat = kernel[::-1, ::-1].reshape(4, cin, cout).astype(dtype)
    kern = functools.partial(_deconv_kernel, compute_dtype=dtype)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // tb, h // th),
        in_specs=[
            pl.BlockSpec((tb, th, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 2 * th, 2 * w, cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 2 * h, 2 * w, cout), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * h * w * 4 * cin * cout,
            bytes_accessed=(x.dtype.itemsize
                            * (b_pad * h * w * cin
                               + b_pad * 4 * h * w * cout)
                            + 4 * cin * cout * dtype.itemsize),
            transcendentals=0,
        ),
    )(x, wmat, bias.astype(jnp.float32).reshape(1, cout))
    return out[:b]


def _fwd(x, kernel, bias, interpret):
    return _forward(x, kernel, bias, interpret), (x, kernel, bias)


def _bwd(interpret, res, g):
    x, kernel, bias = res
    # dx[b,i,j,ci] = sum_{di,dj} g[b,2i+di,2j+dj,:] @ W[1-di,1-dj].T — a
    # plain stride-2 VALID conv of g with the flipped, (in/out)-swapped
    # kernel: XLA lowers it as a standard strided convolution (exact
    # adjoint of the flax-semantics forward above).
    dx = jax.lax.conv_general_dilated(
        g.astype(jnp.float32),
        jnp.swapaxes(kernel[::-1, ::-1], 2, 3).astype(jnp.float32),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    # dW[a,b,ci,co] = sum_{n,i,j} x[n,i,j,ci] g[n,2i+(1-a),2j+(1-b),co]
    # (the flip mirrors the forward's tap orientation).
    b, h, w, cin = x.shape
    cout = g.shape[-1]
    gs = g.astype(jnp.float32).reshape(b, h, 2, w, 2, cout)
    xf = x.astype(jnp.float32).reshape(b * h * w, cin)
    dk = jnp.einsum(
        "pi,pxyo->xyio",
        xf,
        gs.transpose(0, 1, 3, 2, 4, 5).reshape(b * h * w, 2, 2, cout),
    )[::-1, ::-1].astype(kernel.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(bias.dtype)
    return dx, dk, db


conv_transpose_2x2.defvjp(_fwd, _bwd)
