"""Spectrogram U-Net (Flax), capability-parity with the reference model.

Reference: ``/root/reference/code/model.py`` — a 4-level encoder/decoder with
skip connections built from [Conv3x3 -> BatchNorm -> ReLU] x 2 blocks
(``model.py:7-20``), conv-before-maxpool downsampling (``model.py:23-32``),
ConvTranspose(k=2,s=2) upsampling with asymmetric zero-padding to re-match
skip spatial dims (``model.py:35-50``), channel widths
1->64->128->256->512, bottleneck 1024, and a final 1x1 conv back to one
channel (``model.py:53-68``). 31,042,369 trainable parameters — asserted in
``tests/test_unet.py``.

TPU-first differences from the PyTorch original:

- **NHWC layout** ``(batch, freq, time, channels)`` — the native layout for
  TPU convolutions (channels ride the 128-wide lane dimension of the MXU).
- **Mixed precision**: convolutions compute in ``dtype`` (bfloat16 by
  default for the MXU) with float32 parameters; BatchNorm statistics stay
  float32 for numeric stability.
- Concatenation order, padding split, and no output activation replicate
  the reference exactly, so a weight-converted checkpoint is layout-
  transposed but otherwise 1:1.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class DoubleConv(nn.Module):
    """[Conv3x3(SAME) -> BatchNorm -> ReLU] x 2 (model.py:7-20)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (i.e. the
            # running average keeps 0.9 of the old value per step).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            x = x.astype(self.dtype)
        return x


def _sincos_2d(h: int, w: int, dim: int):
    """Fixed 2-D sin/cos positional encoding (h, w, dim), trace-time.

    Shape-generic by construction: computed from the static trace-time
    spatial dims, so the same parameters serve the (16, 4) training
    bottleneck and the (16, 7)-ish whole-clip eval bottlenecks (the
    reference evaluates at (257, T) — SURVEY.md §3.3)."""
    import numpy as np_

    half = dim // 2

    def enc(n, d):
        pos = np_.arange(n, dtype=np_.float64)[:, None]
        i = np_.arange(d // 2, dtype=np_.float64)[None, :]
        ang = pos / np_.power(10000.0, 2.0 * i / d)
        return np_.concatenate([np_.sin(ang), np_.cos(ang)], axis=-1)

    eh = enc(h, half)  # (h, half)
    ew = enc(w, dim - half)  # (w, dim - half)
    pe = np_.concatenate(
        [
            np_.broadcast_to(eh[:, None, :], (h, w, half)),
            np_.broadcast_to(ew[None, :, :], (h, w, dim - half)),
        ],
        axis=-1,
    )
    return pe.astype(np_.float32)


class BottleneckAttention(nn.Module):
    """One pre-LN multi-head self-attention block over bottleneck pixels.

    The U-Net's receptive field is local; reverb — the hardest corruption
    (a ~0.4 s exact JUCE IR, ``dsp/noise.py``) — smears energy across the
    whole 2 s window, so a global mixing step at the (H/16 x W/16)
    bottleneck (64 tokens at the training crop) gives the decoder
    clip-wide context at negligible FLOP cost. Residual with a zero-init
    output projection: at init the block is an exact no-op, so the
    attention variant starts from the proven convolutional behavior.
    """

    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        pe = jnp.asarray(_sincos_2d(h, w, c)).reshape(1, h * w, c)
        y = x.reshape(b, h * w, c)
        tok = nn.LayerNorm(dtype=jnp.float32, name="ln")(y)
        tok = (tok + pe).astype(self.dtype)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=max(64, c // 4),
            out_features=c,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.lecun_normal(),
            out_kernel_init=nn.initializers.zeros,
            name="mhsa",
        )(tok)
        return (y + attn).reshape(b, h, w, c).astype(self.dtype)


class PallasConvTranspose2x2(nn.Module):
    """Drop-in ConvTranspose(k=2,s=2,VALID) backed by the Pallas kernel.

    Parameter names, shapes, dtypes, and initializers match
    ``nn.ConvTranspose`` exactly, so checkpoints are interchangeable with
    the XLA path; only the forward lowering differs
    (``ops/pallas/deconv_kernel.py`` — the four sub-pixel matmuls are
    interleaved in VMEM instead of XLA's deconv lowering). Interpret mode
    is selected off-TPU, like the STFT kernels.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.pallas.deconv_kernel import conv_transpose_2x2

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if self.features < 128:
            # Mosaic rejects the kernel's 5-D bf16 relayout when Cout is
            # under the 128-lane width (measured round 3: the 31M net's
            # up3 deconv, Cout=64, fails to compile at batch 1024). Use
            # flax's own lowering for those layers — same params.
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=False,
            )
            return y + bias.astype(self.dtype)
        return conv_transpose_2x2(
            x.astype(self.dtype),
            kernel,
            bias,
            jax.default_backend() == "cpu",
        )


def space_to_depth(x: jax.Array) -> jax.Array:
    """NHWC (B, H, W, C) -> (B, H/2, W/2, 4C), 2x2 blocks into channels.

    Channel order is (a, b, c) row-major over the 2x2 phase (a, b) — the
    exact inverse of :func:`depth_to_space`. H and W must be even."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array, out_channels: int) -> jax.Array:
    """NHWC (B, H, W, 4*out_channels) -> (B, 2H, 2W, out_channels)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, out_channels)


def _pad_to_match(x: jax.Array, target: jax.Array) -> jax.Array:
    """Asymmetric zero-pad H/W of ``x`` up to ``target``'s (model.py:44-47)."""
    dy = target.shape[1] - x.shape[1]
    dx = target.shape[2] - x.shape[2]
    if dy == 0 and dx == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
    )


class UNet(nn.Module):
    """4-level magnitude-spectrogram U-Net, NHWC in/out with 1 channel.

    Fully convolutional: accepts any (freq, time) at least 16 px on each
    side, including the training shape (256, 64) and the whole-clip eval
    shape (257, T) (``/root/reference/code/test.py:100-114``). Output is a
    raw linear-magnitude regression (no activation), like the reference.
    """

    features: Sequence[int] = (64, 128, 256, 512)
    bottleneck: int = 1024
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize DoubleConv blocks (activation
    # memory ~halves in backward, trading recompute — raises the max
    # trainable batch per chip)
    zero_out_init: bool = False  # zero-init the final 1x1 conv: used by
    # the residual complex-mask head so a fresh network is an exact
    # pass-through (deviation-from-identity starts at zero)
    pallas_deconv: bool = False  # lower the k=2,s=2 upsampling deconvs
    # through the Pallas sub-pixel-matmul kernel instead of XLA's
    # deconv lowering; parameters are identical either way
    attn_bottleneck: bool = False  # insert one residual self-attention
    # block after the bottleneck convs (global context for corruptions
    # with clip-wide structure, e.g. reverb); zero-init projection makes
    # a fresh attention variant forward-identical to the plain U-Net
    s2d_stem: bool = False  # space-to-depth stem: pack each 2x2 input
    # block into channels so the whole first U-Net level runs at half
    # spatial resolution (4x fewer level-0 activation bytes — the
    # HBM-bound full-resolution cin=1 stem is the measured residual
    # bottleneck of the fused graph, docs/STATUS.md roofline), and the
    # output head emits 4*out_channels that depth-to-space unpacks back
    # to full resolution (sub-pixel head). An architecture change (not
    # checkpoint-convertible from the plain net): quality must be
    # re-established per recipe, throughput A/B in
    # examples/bench_s2d_stem.py
    s2d_skip: int = 0  # with s2d_stem: width of a full-resolution
    # refinement path. The round-4/5 A/Bs located the s2d tier's quality
    # gap in fine spectral structure the half-res pyramid cannot carry
    # (distillation recovers only ~0.15 dB of the ~0.7 dB gap — it is
    # architecture-bound, not supervision-bound). This path runs ONE
    # BN-free Conv3x3->ReLU over the full-res input, concatenates it with
    # the depth-to-space head features (the 1x1 "out" conv emits
    # 4*s2d_skip channels instead of 4*out_channels), and a final full-res
    # Conv3x3 emits the output — a few full-res channels at ~1% of the
    # FLOPs the half-res pyramid saves. zero_out_init moves to the final
    # refine conv, preserving the residual-mask identity-at-init contract.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        x_full = None
        if self.s2d_stem:
            in_h, in_w = x.shape[1], x.shape[2]
            ph, pw = (-in_h) % 2, (-in_w) % 2
            if ph or pw:  # odd eval shapes, e.g. (257, T) whole clips
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            x_full = x
            x = space_to_depth(x)
        block = (
            nn.remat(DoubleConv, static_argnums=(2,)) if self.remat else DoubleConv
        )
        skips = []
        for i, f in enumerate(self.features):
            x = block(f, dtype=self.dtype, name=f"down{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

        x = block(self.bottleneck, dtype=self.dtype, name="bottleneck")(x, train)
        if self.attn_bottleneck:
            x = BottleneckAttention(dtype=self.dtype, name="bottleneck_attn")(x)

        for i, (f, skip) in enumerate(zip(reversed(self.features), reversed(skips))):
            if self.pallas_deconv:
                x = PallasConvTranspose2x2(
                    f, dtype=self.dtype, name=f"up{i}_deconv"
                )(x)
            else:
                x = nn.ConvTranspose(
                    f,
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"up{i}_deconv",
                )(x)
            x = _pad_to_match(x, skip)
            # skip first, upsampled second — reference cat order (model.py:49)
            x = jnp.concatenate([skip, x], axis=-1)
            x = block(f, dtype=self.dtype, name=f"up{i}_conv")(x, train)

        refine = bool(self.s2d_stem and self.s2d_skip)
        head_ch = self.s2d_skip if refine else self.out_channels
        x = nn.Conv(
            head_ch * (4 if self.s2d_stem else 1),
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
            **(
                {"kernel_init": nn.initializers.zeros}
                if self.zero_out_init and not refine
                else {}
            ),
        )(x)
        if self.s2d_stem:
            if refine:
                x = depth_to_space(x, self.s2d_skip)
                fr = nn.relu(nn.Conv(
                    self.s2d_skip,
                    kernel_size=(3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="s2d_skip_conv",
                )(x_full))
                x = nn.Conv(
                    self.out_channels,
                    kernel_size=(3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="s2d_refine",
                    **(
                        {"kernel_init": nn.initializers.zeros}
                        if self.zero_out_init
                        else {}
                    ),
                )(jnp.concatenate([x, fr], axis=-1))
            else:
                x = depth_to_space(x, self.out_channels)
            x = x[:, :in_h, :in_w, :]
        return x.astype(in_dtype)


def scaled_widths(width_mult: float = 1.0) -> tuple[tuple[int, ...], int]:
    """Channel widths for a width-scaled U-Net family.

    ``width_mult=1.0`` is the reference architecture (64..512, bottleneck
    1024, 31.0 M params — ``model.py:53-68``); fractional multipliers give
    compact students for latency-bound serving (0.5 -> 7.8 M, 0.25 ->
    2.0 M params). Widths round to multiples of 8 so every channel count
    tiles the MXU lane dimension cleanly.
    """
    if width_mult <= 0:
        raise ValueError(f"width_mult must be positive, got {width_mult}")

    def _scale(c: int) -> int:
        return max(8, int(round(c * width_mult / 8)) * 8)

    return tuple(_scale(c) for c in (64, 128, 256, 512)), _scale(1024)


def width_kwargs(width_mult: float) -> dict:
    """UNet constructor kwargs for a width multiplier ({} at 1.0).

    The single place the width contract lives — every constructor site
    (train loop, CLIs, loaders, bench, examples) routes through this.
    """
    if width_mult == 1.0:
        return {}
    feats, bottleneck = scaled_widths(width_mult)
    return {"features": feats, "bottleneck": bottleneck}


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


if __name__ == "__main__":
    # shape smoke test mirroring the reference's only executable test
    # (model.py:97-101): forward a (1, 256, 256) input, print the shape
    model = UNet()
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 1), jnp.float32))
    )(jax.random.key(0))
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 256, 256, 1), jnp.float32)
    )
    print("Output shape:", out.shape)
    print("Trainable parameters:", count_params(variables["params"]))
