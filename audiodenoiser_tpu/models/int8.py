"""Int8 MXU *compute* for U-Net inference (not just int8 storage).

``train/quantize.py`` shrinks exports by storing int8 weights that are
dequantized back to float before use. This module executes the convolutions
themselves in int8 on the MXU (int8 x int8 -> int32, the systolic array's
highest-throughput mode):

1. **BatchNorm folding** — eval-mode BN is an affine per-channel transform,
   so each [Conv -> BN] pair collapses into one conv with scaled kernel and
   shifted bias (standard inference fusion; the reference never fuses,
   ``/root/reference/code/model.py:7-20`` keeps BN layers at eval).
2. **Per-output-channel symmetric int8 weights** (scale = absmax/127 per
   cout, same scheme as the storage quantizer).
3. **Dynamic per-tensor activation quantization** — each conv input is
   scaled by absmax/127 on the fly (one reduction, fused by XLA), so no
   calibration pass is needed.
4. Accumulation in int32, rescale to float32 by ``s_x * s_w[cout]``, bias
   add, ReLU — all fused into the conv epilogue by XLA.

``Int8UNet`` exposes the standard ``model.apply(variables, x, train=False)``
surface, so it drops into ``eval.runner.DenoiserRunner`` and the benchmark
(``bench.py --mode int8``) unchanged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiodenoiser_tpu.models.unet import _pad_to_match

_DN = ("NHWC", "HWIO", "NHWC")


def _fold_conv_bn(conv: dict, bn_params: dict, bn_stats: dict, eps=1e-5):
    """[Conv -> eval BatchNorm] -> single conv (kernel', bias')."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mult = gamma / jnp.sqrt(var + eps)  # (cout,)
    kernel = jnp.asarray(conv["kernel"], jnp.float32) * mult
    bias = (jnp.asarray(conv["bias"], jnp.float32) - mean) * mult + beta
    return kernel, bias


def _quantize_kernel(kernel: jax.Array, bias: jax.Array) -> dict:
    """Per-output-channel symmetric int8 (same scheme as train/quantize)."""
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q8 = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return {"kernel": q8, "scale": scale, "bias": jnp.asarray(bias, jnp.float32)}


def prepare_int8(params, batch_stats, features: Sequence[int] = (64, 128, 256, 512)):
    """Fold BN into every DoubleConv and quantize all kernels to int8.

    Returns the variables tree ``Int8UNet.apply`` consumes. Runs once at
    load time (all ops jittable; inputs may be host or device arrays).
    """

    def fold_double(name):
        out = {}
        for i in range(2):
            k, b = _fold_conv_bn(
                params[name][f"conv{i}"],
                params[name][f"bn{i}"],
                batch_stats[name][f"bn{i}"],
            )
            out[f"conv{i}"] = _quantize_kernel(k, b)
        return out

    tree = {}
    for i in range(len(features)):
        tree[f"down{i}"] = fold_double(f"down{i}")
        tree[f"up{i}_deconv"] = _quantize_kernel(
            jnp.asarray(params[f"up{i}_deconv"]["kernel"], jnp.float32),
            jnp.asarray(params[f"up{i}_deconv"]["bias"], jnp.float32),
        )
        tree[f"up{i}_conv"] = fold_double(f"up{i}_conv")
    tree["bottleneck"] = fold_double("bottleneck")
    tree["out"] = _quantize_kernel(
        jnp.asarray(params["out"]["kernel"], jnp.float32),
        jnp.asarray(params["out"]["bias"], jnp.float32),
    )
    return tree


def _quant_act(x: jax.Array):
    s = jnp.max(jnp.abs(x)) / 127.0
    s = jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return xq, s


def _int8_conv(x: jax.Array, q: dict) -> jax.Array:
    xq, sx = _quant_act(x)
    y = jax.lax.conv_general_dilated(
        xq, q["kernel"], (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]


def _int8_deconv(x: jax.Array, q: dict) -> jax.Array:
    xq, sx = _quant_act(x)
    y = jax.lax.conv_transpose(
        xq, q["kernel"], (2, 2), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]


def _double(x: jax.Array, q: dict) -> jax.Array:
    x = nn.relu(_int8_conv(x, q["conv0"]))
    return nn.relu(_int8_conv(x, q["conv1"]))


class Int8UNet:
    """Drop-in ``apply`` shim running the folded int8 forward pass."""

    def __init__(self, features: Sequence[int] = (64, 128, 256, 512)):
        self.features = tuple(features)

    def apply(self, variables, x: jax.Array, train: bool = False) -> jax.Array:
        if train:
            raise ValueError("Int8UNet is inference-only")
        in_dtype = x.dtype
        h = x.astype(jnp.float32)
        skips = []
        for i in range(len(self.features)):
            h = _double(h, variables[f"down{i}"])
            skips.append(h)
            h = nn.max_pool(h, window_shape=(2, 2), strides=(2, 2))
        h = _double(h, variables["bottleneck"])
        for i, skip in enumerate(reversed(skips)):
            h = _int8_deconv(h, variables[f"up{i}_deconv"])
            h = _pad_to_match(h, skip)
            h = jnp.concatenate([skip, h], axis=-1)
            h = _double(h, variables[f"up{i}_conv"])
        h = _int8_conv(h, variables["out"])
        return h.astype(in_dtype)

    def __hash__(self):
        return hash(("Int8UNet", self.features))

    def __eq__(self, other):
        return isinstance(other, Int8UNet) and self.features == other.features
