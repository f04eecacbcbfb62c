"""Pipeline parallelism (pp): stage-split U-Net inference across devices.

The fifth axis of the parallelism story (dp/tp in ``parallel.mesh``, sp in
``parallel.spatial``, ep in ``eval.ensemble``): the U-Net's block sequence
— down0..down3, bottleneck, up0..up3, out — is partitioned into contiguous
stages, one per device, with each stage's parameters resident only on its
device. Microbatches flow through the chain; because JAX dispatch is
asynchronous, issuing microbatch *m*'s stage *i* immediately after *m-1*'s
queues overlapping work on every device — a GPipe-style inference pipeline
without any scheduler thread.

U-Net specifics: encoder skip activations are consumed by the *mirror*
decoder stage, so the skip tuple travels down the chain with the
activation (the pp cost unique to U-shaped models). Stage modules reuse
the exact ``DoubleConv``/deconv blocks and submodule *names* of
``models.UNet``, so a trained checkpoint's parameter tree splits across
stages by key with no conversion, and the pipelined forward is numerically
identical to the monolithic one (tested in ``tests/test_pipeline.py``).

When is pp the right axis? A 31 M-param U-Net fits one chip, so for this
model dp/sp win; pp is the layout that keeps scaling when a *future* model
family outgrows a single device's HBM — and it composes with dp (pipeline
per data-parallel replica).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiodenoiser_tpu.models.unet import DoubleConv, _pad_to_match


class _Stage(nn.Module):
    """A contiguous chunk of the U-Net block sequence.

    ``downs``/``ups`` are (submodule_name, features) with names matching
    ``models.UNet`` ('down0', 'up2', ...), so this module's parameter tree
    is a key-slice of the full U-Net's.
    """

    downs: Sequence[tuple] = ()
    bottleneck: Optional[int] = None
    ups: Sequence[tuple] = ()
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skips: tuple, train: bool = False):
        x = x.astype(self.dtype)
        skips = list(skips)
        for name, f in self.downs:
            x = DoubleConv(f, dtype=self.dtype, name=name)(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        if self.bottleneck is not None:
            x = DoubleConv(self.bottleneck, dtype=self.dtype,
                           name="bottleneck")(x, train)
        for name, f in self.ups:
            skip = skips.pop()
            x = nn.ConvTranspose(
                f, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{name}_deconv",
            )(x)
            x = _pad_to_match(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(f, dtype=self.dtype, name=f"{name}_conv")(x, train)
        if self.out_channels is not None:
            x = nn.Conv(
                self.out_channels, kernel_size=(1, 1), dtype=self.dtype,
                param_dtype=jnp.float32, name="out",
            )(x)
        return x, tuple(skips)


def _block_sequence(features: Sequence[int], bottleneck: int,
                    out_channels: int):
    seq = [("down", f"down{i}", f) for i, f in enumerate(features)]
    seq.append(("bottleneck", "bottleneck", bottleneck))
    seq += [
        ("up", f"up{i}", f)
        for i, f in enumerate(reversed(list(features)))
    ]
    seq.append(("out", "out", out_channels))
    return seq


def make_stages(
    n_stages: int,
    features: Sequence[int] = (64, 128, 256, 512),
    bottleneck: int = 1024,
    out_channels: int = 1,
    dtype: jnp.dtype = jnp.float32,
) -> list[_Stage]:
    """Split the U-Net block sequence into ``n_stages`` contiguous stages."""
    seq = _block_sequence(features, bottleneck, out_channels)
    if not 1 <= n_stages <= len(seq):
        raise ValueError(f"n_stages must be in [1, {len(seq)}]")
    stages = []
    for chunk in np.array_split(np.arange(len(seq)), n_stages):
        downs, ups, bn, out = [], [], None, None
        for i in chunk:
            kind, name, f = seq[i]
            if kind == "down":
                downs.append((name, f))
            elif kind == "bottleneck":
                bn = f
            elif kind == "up":
                ups.append((name, f))
            else:
                out = f
        stages.append(_Stage(downs=tuple(downs), bottleneck=bn,
                             ups=tuple(ups), out_channels=out, dtype=dtype))
    return stages


def _stage_param_keys(stage: _Stage) -> list[str]:
    keys = [name for name, _ in stage.downs]
    if stage.bottleneck is not None:
        keys.append("bottleneck")
    for name, _ in stage.ups:
        keys += [f"{name}_deconv", f"{name}_conv"]
    if stage.out_channels is not None:
        keys.append("out")
    return keys


def split_variables(variables: Any, stages: Sequence[_Stage]) -> list[dict]:
    """Key-slice a full U-Net variable collection into per-stage trees."""
    out = []
    for stage in stages:
        keys = _stage_param_keys(stage)
        tree = {}
        for coll, sub in variables.items():  # 'params', 'batch_stats'
            picked = {k: sub[k] for k in keys if k in sub}
            if picked:
                tree[coll] = picked
        out.append(tree)
    return out


class PipelinedDenoiser:
    """Stage-per-device pipelined U-Net forward (inference).

    Args:
      variables: a full U-Net variable collection (params + batch_stats).
      devices: one device per stage (default: all available, capped at the
        block count). Stage *i*'s parameters live only on ``devices[i]``.
      features/bottleneck/out_channels/dtype: the U-Net architecture.
    """

    def __init__(
        self,
        variables: Any,
        devices: Optional[Sequence] = None,
        features: Sequence[int] = (64, 128, 256, 512),
        bottleneck: int = 1024,
        out_channels: int = 1,
        dtype: jnp.dtype = jnp.float32,
    ):
        if devices is None:
            devices = jax.devices()
        n = min(len(devices), len(_block_sequence(features, bottleneck,
                                                  out_channels)))
        self.devices = list(devices)[:n]
        self.stages = make_stages(n, features, bottleneck, out_channels,
                                  dtype)
        self.stage_vars = [
            jax.device_put(v, d)
            for v, d in zip(split_variables(variables, self.stages),
                            self.devices)
        ]
        self._fns = [
            jax.jit(stage.apply, static_argnames=("train",))
            for stage in self.stages
        ]

    def __call__(self, x: jax.Array, microbatches: int = 4) -> jax.Array:
        """(B, F, T, C) -> (B, F, T, C); ``microbatches`` splits the batch
        so stage *i* of one microbatch overlaps stage *i+1* of the previous
        (async dispatch does the interleaving)."""
        in_dtype = x.dtype
        b = x.shape[0]
        m = max(1, min(microbatches, b))
        bounds = np.linspace(0, b, m + 1).astype(int)
        outs = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if lo == hi:
                continue
            a = jax.device_put(x[lo:hi], self.devices[0])
            skips: tuple = ()
            for fn, vars_, dev in zip(self._fns, self.stage_vars,
                                      self.devices):
                a = jax.device_put(a, dev)
                skips = tuple(jax.device_put(s, dev) for s in skips)
                a, skips = fn(vars_, a, skips, train=False)
            outs.append(a)
        return jnp.concatenate(outs, axis=0).astype(in_dtype)
