"""Per-channel int8 weight quantization for exported checkpoints.

Symmetric per-output-channel int8 for the 4-D convolution kernels (the
~124 MB of a 31 M-parameter export shrinks ~4x); biases, BatchNorm
parameters, and running stats stay float32. Dequantized weights reproduce
the bf16 forward pass within float tolerance (``tests/test_quantize.py``),
so quantized exports are a drop-in for serving where checkpoint size /
distribution bandwidth matters.

Wire format: each quantized leaf becomes ``{"__q8__": int8[...,cout],
"scale": f32[cout]}`` inside the ordinary msgpack tree; ``dequantize_tree``
restores plain float32 leaves. ``checkpoints.export_model(...,
quantize=True)`` / ``load_exported`` handle the framing.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_QKEY = "__q8__"


def _is_quantized_leaf(x: Any) -> bool:
    return isinstance(x, dict) and _QKEY in x


def quantize_tree(params: Any) -> Any:
    """Quantize all 4-D float kernels to per-output-channel int8."""

    def q(leaf):
        arr = np.asarray(leaf)
        if arr.ndim != 4 or arr.dtype.kind != "f":
            return np.asarray(arr, np.float32)
        absmax = np.abs(arr).reshape(-1, arr.shape[-1]).max(axis=0)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q8 = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {_QKEY: q8, "scale": scale}

    return jax.tree_util.tree_map(q, jax.device_get(params))


def dequantize_tree(tree: Any) -> Any:
    """Inverse of quantize_tree (float leaves pass through)."""

    def dq(leaf):
        if _is_quantized_leaf(leaf):
            return (
                leaf[_QKEY].astype(np.float32) * np.asarray(leaf["scale"], np.float32)
            )
        return leaf

    return jax.tree_util.tree_map(dq, tree, is_leaf=_is_quantized_leaf)


def is_quantized(tree: Any) -> bool:
    found = []

    def check(leaf):
        if _is_quantized_leaf(leaf):
            found.append(True)
        return leaf

    jax.tree_util.tree_map(check, tree, is_leaf=_is_quantized_leaf)
    return bool(found)
