"""Checkpointing: orbax full train state + single-file model export.

The reference only ever saves model weights — ``torch.save(state_dict)`` to
``best_model.pth`` on validation improvement (``train.py:140-143``) — and
never the optimizer, so resume is impossible. Here:

- ``export_model`` writes a single msgpack file of {params, batch_stats}
  — the ``.pth`` analog, named ``unet_denoiser_{noise}.ckpt`` by the eval
  workflow (``test.py:15,59``);
- ``save_train_state``/``restore_train_state`` keep the *full* optimizer +
  BN + epoch state in an orbax directory so ``--resume`` works (a deliberate
  capability extension documented in SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization

import orbax.checkpoint as ocp


def export_model(
    path: str, params: Any, batch_stats: Any, quantize: bool = False
) -> None:
    """Single-file msgpack export; ``quantize=True`` stores conv kernels as
    per-channel int8 (~4x smaller, see ``train.quantize``)."""
    if quantize:
        from audiodenoiser_tpu.train.quantize import quantize_tree

        payload = {
            "format": "int8-v1",
            "params": quantize_tree(params),
            "batch_stats": jax.device_get(batch_stats),
        }
    else:
        payload = {"params": params, "batch_stats": batch_stats}
    data = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_exported(path: str, template: Any | None = None) -> dict:
    """Load an export, transparently dequantizing int8 payloads."""
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if isinstance(raw, dict) and raw.get("format") == "int8-v1":
        from audiodenoiser_tpu.train.quantize import dequantize_tree

        raw = {
            "params": dequantize_tree(raw["params"]),
            "batch_stats": raw["batch_stats"],
        }
    if template is not None:
        return serialization.from_state_dict(template, raw)
    return raw


def save_train_state(ckpt_dir: str, state_tree: Any) -> None:
    """Atomic orbax save of an arbitrary pytree (params/opt/bn/counters)."""
    path = os.path.abspath(ckpt_dir)
    checkpointer = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    state_tree = jax.device_get(state_tree)
    checkpointer.save(path, state_tree)
    checkpointer.wait_until_finished()


def restore_train_state(ckpt_dir: str, template: Any) -> Any:
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(ckpt_dir), template)


def saved_keys(ckpt_dir: str) -> set[str]:
    """Top-level keys of a saved train-state checkpoint (from orbax
    metadata, no tensor reads) — lets resume pick the right template
    (EMA vs plain layout) by inspection instead of try/except-all."""
    meta = ocp.StandardCheckpointer().metadata(os.path.abspath(ckpt_dir))
    tree = getattr(meta, "item_metadata", None) or getattr(meta, "tree", meta)
    if hasattr(tree, "tree"):
        tree = tree.tree
    return set(tree.keys())


def record_best_val(ckpt_path: str, val_loss: float, epoch: int) -> None:
    """Write the ``.val.json`` sidecar beside a best-model export.

    The resume state can be coarser than the per-epoch best export
    (``--ckpt_every``); this sidecar keeps the exported checkpoint's val
    loss authoritative across resumes (see :func:`best_val_floor`)."""
    import json

    with open(os.path.splitext(ckpt_path)[0] + ".val.json", "w") as f:
        json.dump({"val_loss": val_loss, "epoch": epoch}, f)


def best_val_floor(ckpt_path: str, current: float) -> float:
    """min(current, the ``.val.json``-recorded loss) — applied after an
    ACTUAL resume restore so a stale restored best_val cannot let a worse
    model overwrite an already-better export."""
    import json

    meta = os.path.splitext(ckpt_path)[0] + ".val.json"
    if os.path.exists(meta):
        with open(meta) as f:
            return min(current, float(json.load(f)["val_loss"]))
    return current
