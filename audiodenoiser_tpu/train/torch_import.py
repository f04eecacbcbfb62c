"""Import reference PyTorch ``.pth`` checkpoints into this framework.

The reference ships/consumes ``torch.save(model.state_dict())`` files named
``unet_denoiser_{noise}.pth`` (``/root/reference/code/train.py:140-143``,
``test.py:59-65``). This module maps that state_dict 1:1 onto the Flax
U-Net so existing trained ensembles keep working:

reference name (model.py)                 -> Flax variable
  downconv{k}.conv.double_conv.{0|3}      -> down{k-1}/conv{0|1}   (Conv)
  downconv{k}.conv.double_conv.{1|4}      -> down{k-1}/bn{0|1}     (BatchNorm)
  bottleneck.double_conv.*                -> bottleneck/*
  upconv{k}.up                            -> up{k-1}_deconv        (ConvTranspose)
  upconv{k}.conv.double_conv.*            -> up{k-1}_conv/*
  out                                     -> out

Layout: torch Conv2d (out,in,kh,kw) -> HWIO (kh,kw,in,out); torch
ConvTranspose2d (in,out,kh,kw) -> (kh,kw,in,out). Numerical equivalence of
a converted checkpoint (forward outputs match the torch model to float
tolerance, eval mode) is asserted in ``tests/test_torch_import.py`` using
the reference model as the oracle.

Only plain tensors are read from the ``.pth`` (``weights_only=True``, like
``test.py:65``); no reference code is executed here.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv(sd: Mapping[str, Any], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}  # OIHW -> HWIO


def _deconv(sd: Mapping[str, Any], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    # torch ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out), spatially
    # flipped: flax ConvTranspose lowers to lax.conv_transpose with
    # transpose_kernel=False (correlation), while torch's transposed conv is
    # the exact adjoint of its forward correlation — a spatial flip apart.
    return {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1], "bias": b}


def _bn(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], dtype=np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], dtype=np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], dtype=np.float32),
    }
    return params, stats


def _double_conv(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    params, stats = {}, {}
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.double_conv.{ci}")
        p, s = _bn(sd, f"{prefix}.double_conv.{bi}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def convert_state_dict(sd: Mapping[str, Any]) -> dict:
    """Torch state_dict -> {"params": ..., "batch_stats": ...} for UNet()."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    for k in range(1, 5):
        p, s = _double_conv(sd, f"downconv{k}.conv")
        params[f"down{k-1}"] = p
        stats[f"down{k-1}"] = s
    p, s = _double_conv(sd, "bottleneck")
    params["bottleneck"] = p
    stats["bottleneck"] = s
    for k in range(1, 5):
        params[f"up{k-1}_deconv"] = _deconv(sd, f"upconv{k}.up")
        p, s = _double_conv(sd, f"upconv{k}.conv")
        params[f"up{k-1}_conv"] = p
        stats[f"up{k-1}_conv"] = s
    params["out"] = _conv(sd, "out")
    return {"params": params, "batch_stats": stats}


def load_pth(path: str) -> dict:
    """Load a reference ``.pth`` (weights_only) and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd)
