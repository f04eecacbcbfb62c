"""Noise-type router: a small CNN classifier over magnitude spectrograms.

The reference requires the *user* to know which corruption a clip suffers —
``test.py:181-199`` loads one specialized checkpoint per noise type and
evaluates each only on its own test set. This router removes that
assumption: a ~120k-parameter classifier predicts the corruption type from
the noisy magnitude spectrogram, so the 4-specialist ensemble becomes a
self-routing mixture of denoisers (``eval/ensemble.py``) — specialist
quality without specialist knowledge.

TPU-first design notes: fully convolutional (stride-2 convs + global
average pool), so one set of weights classifies both the (256, 64) training
crop and whole variable-length (257, T) eval clips; GroupNorm instead of
BatchNorm keeps inference free of running-statistics state; compute in
bfloat16 with float32 logits.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# label order — matches OnDeviceMixer._corrupt_each (data/pipeline.py) and
# the reference's NOISE_TYPES (/root/reference/code/test.py:24)
NOISE_CLASSES = ("white", "urban", "reverb", "noise_cancellation")


class NoiseClassifier(nn.Module):
    """log1p -> [Conv3x3 s2 -> GroupNorm -> ReLU] x 4 -> GAP -> Dense."""

    num_classes: int = len(NOISE_CLASSES)
    widths: Sequence[int] = (16, 32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, F, T, 1) linear magnitudes -> (B, num_classes) f32 logits."""
        x = jnp.log1p(x).astype(self.dtype)
        for i, w in enumerate(self.widths):
            x = nn.Conv(
                w,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.GroupNorm(
                num_groups=8, dtype=jnp.float32, name=f"gn{i}"
            )(x)
            x = nn.relu(x).astype(self.dtype)
        x = jnp.mean(x, axis=(1, 2))  # GAP: shape-agnostic over (F, T)
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="head",
        )(x)
