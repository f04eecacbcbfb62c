"""Export Flax U-Net checkpoints as reference-compatible torch ``.pth``.

The inverse of :mod:`audiodenoiser_tpu.train.torch_import`: models trained
here can be handed back to the reference's eval script
(``/root/reference/code/test.py:59-65`` loads
``torch.load(..., weights_only=True)`` state_dicts named
``unet_denoiser_{noise}.pth``) or to any torch tooling, completing the
two-way migration story (docs/MIGRATION in README). Every tensor
transform mirrors torch_import exactly:

  Flax variable                 -> reference state_dict name (model.py)
  down{k-1}/conv{0|1}           -> downconv{k}.conv.double_conv.{0|3}
  down{k-1}/bn{0|1}             -> downconv{k}.conv.double_conv.{1|4}
  bottleneck/*                  -> bottleneck.double_conv.*
  up{k-1}_deconv                -> upconv{k}.up
  up{k-1}_conv/*                -> upconv{k}.conv.double_conv.*
  out                           -> out

Layouts: Flax Conv HWIO (kh,kw,in,out) -> torch OIHW; Flax ConvTranspose
(kh,kw,in,out, spatially flipped relative to torch's adjoint convention —
see torch_import._deconv) -> torch (in,out,kh,kw) with the flip undone.
BatchNorm adds the ``num_batches_tracked`` long tensor torch's
``load_state_dict(strict=True)`` expects (content is irrelevant to eval:
it only feeds momentum-free running-average updates during training).

Round-trip exactness (export -> convert_state_dict == original, and the
torch oracle's forward matches the Flax forward on an exported file) is
asserted in ``tests/test_torch_export.py``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv(params: Mapping[str, Any], out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(params["kernel"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _np(params["bias"])


def _deconv(params: Mapping[str, Any], out: dict, prefix: str) -> None:
    k = _np(params["kernel"])[::-1, ::-1]  # undo the adjoint spatial flip
    out[f"{prefix}.weight"] = k.transpose(2, 3, 0, 1)
    out[f"{prefix}.bias"] = _np(params["bias"])


def _bn(params: Mapping[str, Any], stats: Mapping[str, Any], out: dict,
        prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), dtype=np.int64)


def _double_conv(params: Mapping[str, Any], stats: Mapping[str, Any],
                 out: dict, prefix: str) -> None:
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        _conv(params[f"conv{i}"], out, f"{prefix}.double_conv.{ci}")
        _bn(params[f"bn{i}"], stats[f"bn{i}"], out,
            f"{prefix}.double_conv.{bi}")


def export_state_dict(variables: Mapping[str, Any]) -> dict:
    """{"params", "batch_stats"} for UNet() -> reference torch state_dict
    (a plain dict of numpy arrays, keyed exactly like
    ``model.py``'s ``UNet().state_dict()``)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict = {}
    for k in range(1, 5):
        _double_conv(params[f"down{k-1}"], stats[f"down{k-1}"], out,
                     f"downconv{k}.conv")
    _double_conv(params["bottleneck"], stats["bottleneck"], out, "bottleneck")
    for k in range(1, 5):
        _deconv(params[f"up{k-1}_deconv"], out, f"upconv{k}.up")
        _double_conv(params[f"up{k-1}_conv"], stats[f"up{k-1}_conv"], out,
                     f"upconv{k}.conv")
    _conv(params["out"], out, "out")
    return out


def save_pth(variables: Mapping[str, Any], path: str) -> None:
    """Write a reference-loadable ``.pth`` (torch.save of tensor dict)."""
    import torch

    sd = {
        # copy: msgpack-restored arrays are read-only views and torch
        # rejects non-writable tensors
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_state_dict(variables).items()
    }
    torch.save(sd, path)
