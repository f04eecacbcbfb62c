"""Sequence parallelism (sp) for long-clip inference: shard the spectrogram
TIME axis over the device mesh with halo exchange.

The reference denoises whole variable-length clips in one forward on a
single device (``/root/reference/code/test.py:100-114``) — clip length is
bounded by one device's memory. TPU-native redesign: partition the
``(freq, T)`` spectrogram into contiguous time shards, one per device, and
run the U-Net under ``shard_map`` where each device

1. exchanges ``halo`` boundary frames with its mesh neighbors via
   ``lax.ppermute`` (a pure ICI shift — devices at the clip edges receive
   zeros, matching zero-padding),
2. forwards its ``shard + 2*halo`` window through the full model locally,
3. crops the valid center back out.

With ``halo >= RECEPTIVE_RADIUS`` (the 4-level U-Net's one-sided time
receptive field, 92 frames) and 16-frame alignment (so the 4 max-pool
grids land identically on every shard), the overlap-tile result is exact:
it equals the unsharded forward of the halo-zero-padded clip, cropped.
Activation memory per chip scales as ``T / n_devices`` — clips far beyond
one chip's HBM become denoisable, and a single long clip parallelizes
across the mesh.

This composes with the dp+tp layout in ``parallel.mesh``: sp is a layout
over *activations* (time), tp over *weights* (channels); here we dedicate a
1-D ``('seq',)`` mesh to keep the halo shift a pure neighbor exchange.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"

# One-sided time receptive field of the 4-level U-Net, in input frames:
# encoder DoubleConvs contribute 2@1 + 2@2 + 2@4 + 2@8 = 30, the bottleneck
# 2@16 = 32, decoder DoubleConvs 2@8 + 2@4 + 2@2 + 2@1 = 30; total 92.
RECEPTIVE_RADIUS = 92

# Four stride-2 max-pools: shard and halo sizes must be multiples of 16 so
# every device's pooling grid coincides with the global one.
ALIGN = 16


def make_seq_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ('seq',) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


_IN_SHARDING = P(None, None, SEQ_AXIS, None)
_SHARD_FN_CACHE: dict = {}


def _sharded_forward(model, mesh: Mesh, n_seq: int, halo: int):
    """Jitted shard_map forward, cached per (model, mesh, n_seq, halo) so
    repeated calls (clip directories, dryruns) reuse one compiled program
    per input shape instead of re-tracing a fresh closure every call."""
    key = (model, mesh, n_seq, halo)
    if key not in _SHARD_FN_CACHE:

        def local_fn(vars_, x):
            # x: (B, F, S, C) local shard. Neighbor exchange: my right-edge
            # frames travel to my right neighbor (their left halo) and vice
            # versa; devices with no neighbor on a side receive zeros,
            # which is exactly the zero padding the edge of the clip sees.
            right_shift = [(i, i + 1) for i in range(n_seq - 1)]
            left_shift = [(i + 1, i) for i in range(n_seq - 1)]
            left_halo = jax.lax.ppermute(
                x[:, :, -halo:, :], SEQ_AXIS, right_shift
            )
            right_halo = jax.lax.ppermute(
                x[:, :, :halo, :], SEQ_AXIS, left_shift
            )
            window = jnp.concatenate([left_halo, x, right_halo], axis=2)
            out = model.apply(vars_, window, train=False)
            return out[:, :, halo : halo + x.shape[2], :]

        _SHARD_FN_CACHE[key] = jax.jit(
            jax.shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(P(), _IN_SHARDING),
                out_specs=_IN_SHARDING,
                check_vma=False,
            )
        )
    return _SHARD_FN_CACHE[key]


def denoise_spec_sharded(
    model,
    variables: Any,
    spec: jax.Array,
    mesh: Mesh,
    halo: int = 96,
) -> jax.Array:
    """Denoise a batch of magnitude spectrograms with the time axis sharded
    over ``mesh``'s 'seq' axis.

    Args:
      model: a ``UNet``-like Flax module (NHWC, ``train=False`` apply).
      variables: its variable collection (replicated on every device).
      spec: ``(B, F, T, C)`` NHWC or ``(F, T)`` single-clip magnitudes.
      mesh: a 1-D ``('seq',)`` mesh from :func:`make_seq_mesh`.
      halo: boundary frames exchanged per side; ``>= RECEPTIVE_RADIUS``
        (rounded up to 16) gives exact overlap-tile reconstruction.

    Returns the denoised array with the input's shape and dtype.
    """
    squeeze = spec.ndim == 2
    if squeeze:
        spec = spec[jnp.newaxis, :, :, jnp.newaxis]
    if spec.ndim != 4:
        raise ValueError(f"expected (F,T) or (B,F,T,C), got {spec.shape}")
    n_seq = mesh.shape[SEQ_AXIS]
    halo = _round_up(max(halo, 1), ALIGN)
    t = spec.shape[2]
    # Each device's shard is a 16-aligned equal slice of at least ``halo``
    # frames, so the halo exchange is a single-hop neighbor ppermute (a
    # shard shorter than the halo would need frames from beyond the
    # adjacent device). Short clips just get extra zero padding.
    shard = max(_round_up((t + n_seq - 1) // n_seq, ALIGN), halo)
    t_pad = shard * n_seq
    spec_p = jnp.pad(spec, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    fn = _sharded_forward(model, mesh, n_seq, halo)
    spec_p = jax.device_put(spec_p, NamedSharding(mesh, _IN_SHARDING))
    out = fn(variables, spec_p)[:, :, :t, :]
    if squeeze:
        out = out[0, :, :, 0]
    return out


@functools.lru_cache(maxsize=None)
def _analysis_synthesis(n_fft: int, hop_length: int, precision: str):
    """Jitted STFT analysis / noisy-phase iSTFT synthesis, cached per DSP
    config (eager complex ops are unsupported on some backends and
    pathologically slow on remote ones)."""
    from audiodenoiser_tpu.dsp import stft as stft_lib

    @jax.jit
    def analysis(w):
        spec = stft_lib.stft(
            w, n_fft=n_fft, hop_length=hop_length, center=True,
            precision=precision,
        )
        return stft_lib.magphase(spec)

    @functools.partial(jax.jit, static_argnames=("length",))
    def synthesis(mag, phase, length):
        spec = jnp.maximum(mag, 0.0).astype(jnp.complex64) * phase
        return stft_lib.istft(
            spec, hop_length=hop_length, n_fft=n_fft, center=True,
            length=length, precision=precision,
        )

    return analysis, synthesis


def denoise_waveform_sharded(
    model,
    variables: Any,
    wav: jax.Array,
    mesh: Mesh,
    n_fft: int = 512,
    hop_length: int = 128,
    halo: int = 96,
    precision: str = "fft",
) -> jax.Array:
    """Waveform-in/waveform-out long-clip denoising with the U-Net forward
    time-sharded over the mesh (noisy-phase reconstruction).

    The STFT/iSTFT stay unsharded — at hop 128 they are ~1e-4 of the
    U-Net's FLOPs — so only the hot forward pays collective traffic: one
    ``2*halo``-frame ``ppermute`` per neighbor pair, riding ICI.
    """
    if wav.ndim != 1:
        raise ValueError(f"expected a single (samples,) clip, got {wav.shape}")

    analysis, synthesis = _analysis_synthesis(n_fft, hop_length, precision)
    mag, phase = analysis(wav)
    denoised = denoise_spec_sharded(model, variables, mag, mesh, halo=halo)
    return synthesis(denoised, phase, wav.shape[-1])


def reference_padded_forward(
    model, variables: Any, spec: jax.Array, halo: int = 96
) -> jax.Array:
    """Unsharded oracle for :func:`denoise_spec_sharded`: forward the clip
    zero-padded by ``halo`` frames per side (and up-padded to the same
    16-aligned total length), then crop. The sharded result is exactly
    this computation, partitioned."""
    squeeze = spec.ndim == 2
    if squeeze:
        spec = spec[jnp.newaxis, :, :, jnp.newaxis]
    halo = _round_up(max(halo, 1), ALIGN)
    t = spec.shape[2]
    t_pad = _round_up(t, ALIGN)
    x = jnp.pad(spec, ((0, 0), (0, 0), (halo, t_pad - t + halo), (0, 0)))
    out = model.apply(variables, x, train=False)[:, :, halo : halo + t, :]
    if squeeze:
        out = out[0, :, :, 0]
    return out
