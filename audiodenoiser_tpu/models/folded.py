"""BatchNorm-folded bfloat16 U-Net forward for production inference.

Eval-mode BatchNorm is a per-channel affine transform, so every
[Conv -> BN] pair in the U-Net collapses into a single convolution with a
rescaled kernel and shifted bias (the same standard fusion the int8 path
uses, ``models/int8.py:38-47``; the reference never fuses —
``/root/reference/code/model.py:7-20`` keeps live BN layers at eval).

This module generalizes that fold to the production **bfloat16** serving
path:

- kernels are folded once at load time and pre-cast to the compute dtype,
  so the compiled graph contains only ``conv -> bias -> relu`` chains —
  no f32 normalization arithmetic, no per-call f32<->bf16 round trips
  around each BN, and ~half the epilogue ops per conv for XLA to schedule;
- biases are stored float32 and cast into the conv epilogue at apply time
  (the whole folded graph stays within bf16 rounding of the unfolded
  graph — asserted in ``tests/test_folded.py``);
- the fold is exact in exact arithmetic: ``BN(conv(x))`` equals
  ``conv'(x) + b'`` with ``k' = k * gamma/sqrt(var+eps)`` and
  ``b' = (b - mean) * gamma/sqrt(var+eps) + beta``.

``FoldedUNet`` exposes the standard ``model.apply(variables, x,
train=False)`` surface (like ``Int8UNet``), so it drops into
``eval.runner.DenoiserRunner``, the HTTP service, and the benchmark
unchanged. ``fold_for_inference`` converts any trained UNet /
ComplexMaskUNet checkpoint (any ``width_mult``); variants with
non-foldable extras (the attention bottleneck's LayerNorm/MHSA) keep
those parameter subtrees verbatim and run them in the original form.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiodenoiser_tpu.models.unet import (
    BottleneckAttention,
    UNet,
    _pad_to_match,
    depth_to_space,
    space_to_depth,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _fold_conv_bn(conv: dict, bn_params: dict, bn_stats: dict,
                  eps: float = 1e-5):
    """[Conv -> eval BatchNorm] -> (kernel', bias') in float32."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    mult = gamma / jnp.sqrt(var + eps)  # (cout,)
    kernel = jnp.asarray(conv["kernel"], jnp.float32) * mult
    bias = (jnp.asarray(conv["bias"], jnp.float32) - mean) * mult + beta
    return kernel, bias


def fold_for_inference(params, batch_stats,
                       features: Sequence[int] = (64, 128, 256, 512),
                       dtype: jnp.dtype = jnp.bfloat16) -> dict:
    """Fold every DoubleConv's BN and pre-cast kernels to ``dtype``.

    Returns the variables tree :class:`FoldedUNet` consumes. Runs once at
    load time; all ops are jittable (inputs may be host or device arrays).
    Non-BN parameter groups (deconvs, the 1x1 out head, and — when present
    — the attention bottleneck) are passed through with kernels cast to
    ``dtype`` and biases kept float32, matching the unfolded compute path.
    """

    def fold_double(name: str) -> dict:
        out = {}
        for i in range(2):
            k, b = _fold_conv_bn(
                params[name][f"conv{i}"],
                params[name][f"bn{i}"],
                batch_stats[name][f"bn{i}"],
            )
            out[f"conv{i}"] = {"kernel": k.astype(dtype), "bias": b}
        return out

    def plain(name: str) -> dict:
        return {
            "kernel": jnp.asarray(params[name]["kernel"]).astype(dtype),
            "bias": jnp.asarray(params[name]["bias"], jnp.float32),
        }

    tree = {}
    for i in range(len(features)):
        tree[f"down{i}"] = fold_double(f"down{i}")
        tree[f"up{i}_deconv"] = plain(f"up{i}_deconv")
        tree[f"up{i}_conv"] = fold_double(f"up{i}_conv")
    tree["bottleneck"] = fold_double("bottleneck")
    tree["out"] = plain("out")
    if "s2d_skip_conv" in params:
        # full-resolution refinement path (s2d_skip): BN-free convs, so
        # nothing to fold — cast-through like the deconvs/head
        tree["s2d_skip_conv"] = plain("s2d_skip_conv")
        tree["s2d_refine"] = plain("s2d_refine")
    if "bottleneck_attn" in params:
        # LayerNorm/MHSA are not BN-foldable; carried verbatim and applied
        # through the original flax module at forward time.
        tree["bottleneck_attn"] = jax.tree_util.tree_map(
            jnp.asarray, params["bottleneck_attn"]
        )
    return tree


def _conv(x: jax.Array, p: dict, relu: bool = True) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), "SAME", dimension_numbers=_DN,
    )
    y = y + p["bias"].astype(y.dtype)
    return nn.relu(y) if relu else y


def _deconv(x: jax.Array, p: dict) -> jax.Array:
    y = jax.lax.conv_transpose(
        x, p["kernel"], (2, 2), "VALID",
        dimension_numbers=_DN, transpose_kernel=False,
    )
    return y + p["bias"].astype(y.dtype)


def _double(x: jax.Array, p: dict) -> jax.Array:
    return _conv(_conv(x, p["conv0"]), p["conv1"])


class FoldedUNet:
    """Drop-in ``apply`` shim running the BN-folded bf16 forward pass.

    Mirrors :class:`~audiodenoiser_tpu.models.unet.UNet`'s dataflow
    exactly (conv-before-pool encoder, asymmetric pad + skip-first concat
    decoder, raw linear out head — ``/root/reference/code/model.py:53-94``)
    with each [Conv -> BN -> ReLU] collapsed to conv(+bias)+ReLU. Output
    channels > 1 (the complex-mask head) are supported, including the
    bounded/residual mask transform (set ``mask_bound``, mirroring
    :class:`~audiodenoiser_tpu.models.complex_mask.ComplexMaskUNet`); the
    optional residual attention bottleneck is applied through the original
    flax module on the carried-through parameters.
    """

    def __init__(self, features: Sequence[int] = (64, 128, 256, 512),
                 dtype: jnp.dtype = jnp.bfloat16,
                 attn_bottleneck: bool = False,
                 attn_heads: int = 4,
                 mask_bound: Optional[float] = None,
                 mask_residual: bool = False,
                 s2d_stem: bool = False,
                 s2d_skip: int = 0,
                 out_channels: int = 1):
        self.features = tuple(features)
        self.dtype = dtype
        self.attn_bottleneck = attn_bottleneck
        self.attn_heads = attn_heads
        self.mask_bound = mask_bound
        self.mask_residual = mask_residual
        self.s2d_stem = s2d_stem
        self.s2d_skip = s2d_skip
        self.out_channels = out_channels

    @classmethod
    def from_model(cls, model: UNet) -> "FoldedUNet":
        """Build the folded shim matching a UNet/ComplexMaskUNet config."""
        return cls(
            features=tuple(model.features),
            dtype=model.dtype if model.dtype != jnp.float32 else jnp.bfloat16,
            attn_bottleneck=model.attn_bottleneck,
            # ComplexMaskUNet carries the tanh mask head; plain UNet doesn't
            mask_bound=getattr(model, "mask_bound", None),
            mask_residual=bool(getattr(model, "residual", False)),
            s2d_stem=model.s2d_stem,
            s2d_skip=getattr(model, "s2d_skip", 0),
            out_channels=model.out_channels,
        )

    def apply(self, variables, x: jax.Array, train: bool = False) -> jax.Array:
        if train:
            raise ValueError("FoldedUNet is inference-only (BN is folded)")
        v = variables.get("params", variables) if isinstance(variables, dict) \
            else variables
        in_dtype = x.dtype
        h = x.astype(self.dtype)
        x_full = None
        if self.s2d_stem:
            in_h, in_w = h.shape[1], h.shape[2]
            ph, pw = (-in_h) % 2, (-in_w) % 2
            if ph or pw:
                h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x_full = h
            h = space_to_depth(h)
        skips = []
        for i in range(len(self.features)):
            h = _double(h, v[f"down{i}"])
            skips.append(h)
            h = nn.max_pool(h, window_shape=(2, 2), strides=(2, 2))
        h = _double(h, v["bottleneck"])
        if self.attn_bottleneck:
            attn = BottleneckAttention(heads=self.attn_heads, dtype=self.dtype)
            h = attn.apply({"params": v["bottleneck_attn"]}, h)
        for i, skip in enumerate(reversed(skips)):
            h = _deconv(h, v[f"up{i}_deconv"])
            h = _pad_to_match(h, skip)
            h = jnp.concatenate([skip, h], axis=-1)
            h = _double(h, v[f"up{i}_conv"])
        h = _conv(h, v["out"], relu=False)
        if self.s2d_stem:
            if self.s2d_skip:
                h = depth_to_space(h, self.s2d_skip)
                fr = _conv(x_full, v["s2d_skip_conv"], relu=True)
                h = _conv(jnp.concatenate([h, fr], axis=-1),
                          v["s2d_refine"], relu=False)
            else:
                h = depth_to_space(h, self.out_channels)
            h = h[:, :in_h, :in_w, :]
        if self.mask_bound is not None:
            # ComplexMaskUNet head: M = K tanh(out) (+ identity when
            # residual) — models/complex_mask.py:48-53
            h = self.mask_bound * jnp.tanh(h)
            if self.mask_residual:
                h = h + jnp.asarray([1.0, 0.0], h.dtype)
        return h.astype(in_dtype)

    def __hash__(self):
        return hash(("FoldedUNet", self.features, str(self.dtype),
                     self.attn_bottleneck, self.attn_heads,
                     self.mask_bound, self.mask_residual,
                     self.s2d_stem, self.s2d_skip, self.out_channels))

    def __eq__(self, other):
        return (isinstance(other, FoldedUNet)
                and self.features == other.features
                and self.dtype == other.dtype
                and self.attn_bottleneck == other.attn_bottleneck
                and self.attn_heads == other.attn_heads
                and self.mask_bound == other.mask_bound
                and self.mask_residual == other.mask_residual
                and self.s2d_stem == other.s2d_stem
                and self.s2d_skip == other.s2d_skip
                and self.out_channels == other.out_channels)


def fold_runner_inputs(model: UNet, variables,
                       dtype: Optional[jnp.dtype] = None):
    """(model, variables) -> (FoldedUNet, folded variables).

    One-call adapter for every serving surface: pass the returned pair to
    ``DenoiserRunner`` (or the HTTP service loaders) in place of the flax
    model + {'params', 'batch_stats'} tree.
    """
    folded_model = FoldedUNet.from_model(model)
    if dtype is not None:
        folded_model = FoldedUNet(
            features=folded_model.features, dtype=dtype,
            attn_bottleneck=folded_model.attn_bottleneck,
            attn_heads=folded_model.attn_heads,
            mask_bound=folded_model.mask_bound,
            mask_residual=folded_model.mask_residual,
            s2d_stem=folded_model.s2d_stem,
            s2d_skip=folded_model.s2d_skip,
            out_channels=folded_model.out_channels,
        )
    folded = fold_for_inference(
        variables["params"], variables["batch_stats"],
        features=folded_model.features, dtype=folded_model.dtype,
    )
    return folded_model, {"params": folded}
