"""Training steps for the complex-ratio-mask model family.

Unlike the magnitude-regression path (``train.loop``), these steps consume
raw (noisy_audio, clean_audio) waveform pairs from
``OnDeviceMixer.sample_audio`` — STFT, feature extraction, masking, and the
combined spectral loss all happen inside the jitted step, so the mask
model trains against exactly the spectra it will see at inference.

Loss: the reference's combined perceptual loss on |S_hat| vs |S_clean|
(keeping metrics comparable across model families) plus a waveform L1 term
— the mask model corrects phase, so a time-domain term is finally
meaningful (the magnitude model cannot use one) — plus an optional
**negative-SI-SDR term** (``make_mask_steps(si_sdr_weight=...)``): the
waveform-domain eval gate scores true SI-SDR against the clean signal, and
round-2 measurement showed the spectral loss alone *mis-optimizes* that
metric on corruptions whose "noisy" input is strongly clean-correlated
(noise_cancellation is amplitude modulation: 29 dB noisy SI-SDR dropped to
14 dB after spectral-only mask training). Training directly on the
deployment metric — the Conv-TasNet-style SI-SNR objective — removes the
loss/metric mismatch (VERDICT r2 weak #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

import audiodenoiser_tpu.dsp.stft as stft_lib
from audiodenoiser_tpu.eval.metrics import si_sdr
from audiodenoiser_tpu.losses import combined_perceptual_loss
from audiodenoiser_tpu.models.complex_mask import (
    ComplexMaskUNet,
    apply_mask,
    spectrogram_features,
)
from audiodenoiser_tpu.train.loop import TrainState, make_optimizer

WAVEFORM_L1_WEIGHT = 0.5
# -SI-SDR enters the total as si_sdr_weight * (-si_sdr_db / SI_SDR_SCALE):
# typical SI-SDR magnitudes are O(10) dB while the spectral total is O(0.1),
# so /20 puts a unit weight in the same regime as the other terms
SI_SDR_SCALE = 20.0
N_FFT = 512
HOP = 128


def create_mask_train_state(
    key: jax.Array,
    model: ComplexMaskUNet | None = None,
    learning_rate: float = 1e-4,
    input_shape: tuple = (1, 64, 64, 3),
    **opt_kwargs,
) -> TrainState:
    """``opt_kwargs`` (schedule/warmup_steps/total_steps/grad_accum) pass
    straight to ``make_optimizer`` so CLI flags are honored for this model
    family too."""
    from audiodenoiser_tpu.train.loop import init_variables

    model = ComplexMaskUNet() if model is None else model
    variables = init_variables(model, key, tuple(input_shape))
    tx = make_optimizer(learning_rate, **opt_kwargs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


FEATURE_TAPS = ("bottleneck",)


def _attention_map(x: jax.Array) -> jax.Array:
    """Channel-count-independent spatial attention map of a feature tensor.

    Mean channel energy, L2-normalized over the spatial plane (attention
    transfer, Zagoruyko & Komodakis 2017). Width-scaled students and the
    full-width teacher share spatial dims at every U-Net depth, so their
    maps compare directly with no projection head — the distillation adds
    ZERO parameters to the student checkpoint.
    """
    a = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1)  # (B, H, W)
    n = jnp.sqrt(jnp.sum(jnp.square(a), axis=(-2, -1), keepdims=True))
    return a / (n + 1e-8)


def _tap_filter(mdl, method_name: str) -> bool:
    return method_name == "__call__" and getattr(mdl, "name", None) in (
        FEATURE_TAPS
    )


def _mask_losses(state: TrainState, params, noisy_audio, clean_audio,
                 train: bool, si_sdr_weight: float = 0.0,
                 si_sdr_clamp: float | None = None,
                 teacher=None, distill_weight: float = 0.0,
                 distill_feat_weight: float = 0.0):
    # center=True everywhere: inference (models/complex_mask.denoise_waveform,
    # eval/runner complex_mask mode) uses center=True, so training must see
    # the same edge-frame statistics.
    spec = stft_lib.stft(noisy_audio, N_FFT, HOP, center=True)
    clean_mag = jnp.abs(stft_lib.stft(clean_audio, N_FFT, HOP, center=True))
    feats = spectrogram_features(spec)
    variables = {"params": params, "batch_stats": state.batch_stats}
    capture = teacher is not None and distill_feat_weight > 0
    mutable = (["batch_stats"] if train else []) + (
        ["intermediates"] if capture else []
    )
    if mutable:
        mask, mutated = state.apply_fn(
            variables, feats, train=train, mutable=mutable,
            **({"capture_intermediates": _tap_filter} if capture else {}),
        )
        new_bs = mutated["batch_stats"] if train else state.batch_stats
        s_feats = (
            jax.tree_util.tree_leaves(mutated["intermediates"])
            if capture else []
        )
    else:
        mask = state.apply_fn(variables, feats, train=False)
        new_bs = state.batch_stats
        s_feats = []
    s_hat = apply_mask(mask, spec)
    losses = combined_perceptual_loss(
        jnp.abs(s_hat)[..., None], clean_mag[..., None]
    )
    y_hat = stft_lib.istft(
        s_hat, HOP, n_fft=N_FFT, center=True, length=clean_audio.shape[-1]
    )
    wav_l1 = jnp.mean(jnp.abs(y_hat - clean_audio))
    total = losses.total + WAVEFORM_L1_WEIGHT * wav_l1
    if teacher is not None and (distill_weight or distill_feat_weight):
        # knowledge distillation for compact students: match the frozen
        # teacher's masked spectrum on the same batch. The L1 runs on the
        # complex masked spectra (real+imag), so disagreement is weighted
        # by spectral energy — masks over near-silent bins don't dominate.
        t_apply, t_vars = teacher
        if capture:
            t_mask, t_mut = t_apply(
                t_vars, feats, train=False, mutable=["intermediates"],
                capture_intermediates=_tap_filter,
            )
            t_feats = jax.tree_util.tree_leaves(t_mut["intermediates"])
        else:
            t_mask = t_apply(t_vars, feats, train=False)
            t_feats = []
        t_mask = jax.lax.stop_gradient(t_mask)
        if distill_weight:
            t_hat = apply_mask(t_mask, spec)
            distill = jnp.mean(
                jnp.abs(jnp.real(s_hat) - jnp.real(t_hat))
                + jnp.abs(jnp.imag(s_hat) - jnp.imag(t_hat))
            )
            total = total + distill_weight * distill
        if distill_feat_weight:
            # feature-level distillation (attention transfer): match the
            # teacher's normalized spatial attention at FEATURE_TAPS.
            # ||a_s - a_t||^2 per example is in [0, 4] — commensurate
            # with the spectral terms without extra scaling.
            feat = sum(
                jnp.mean(jnp.sum(
                    jnp.square(
                        _attention_map(s)
                        - jax.lax.stop_gradient(_attention_map(t))
                    ),
                    axis=(-2, -1),
                ))
                for s, t in zip(s_feats, t_feats)
            ) / max(len(s_feats), 1)
            total = total + distill_feat_weight * feat
    if si_sdr_weight:
        # maximize mean SI-SDR of the reconstruction (float32 accumulation:
        # the projection/ratio arithmetic is precision-sensitive)
        sdr = si_sdr(y_hat.astype(jnp.float32), clean_audio.astype(jnp.float32))
        if si_sdr_clamp is not None:
            # Saturate the per-example reward. noise_cancellation leaves
            # 20% of training chunks bit-identical to clean (p=0.8 gate,
            # dsp/noise.py): through an identity-init residual mask those
            # score ~110 dB, so an UNCLAMPED mean is maximized by the
            # identity mask (0.2*110 > 0.8*10) — measured round 3: the
            # specialist converged to an exact pass-through (28.977 ->
            # 28.975 dB, zero denoising). Clamping at ~30 dB (where SI-SDR
            # is perceptually saturated, same threshold as the eval
            # aggregate) zeroes the gradient on already-perfect clips so
            # the corrupted 80% drive the objective.
            sdr = jnp.minimum(sdr, si_sdr_clamp)
        total = total - si_sdr_weight * jnp.mean(sdr) / SI_SDR_SCALE
    return total, losses._replace(total=total), new_bs


def make_mask_steps(si_sdr_weight: float = 0.0,
                    si_sdr_clamp: float | None = None,
                    teacher=None, distill_weight: float = 0.0,
                    distill_feat_weight: float = 0.0):
    """Build (train_step, eval_step) jitted closures for the mask family
    with the given -SI-SDR weight. Both steps report the SAME total the
    optimizer sees, so best-val checkpoint selection tracks the deployed
    objective.

    si_sdr_clamp: saturate the per-example SI-SDR reward at this many dB
    (None = unclamped). Essential for corruptions that leave some training
    examples untouched (noise_cancellation) — see _mask_losses.

    teacher: optional ``(apply_fn, variables)`` of a frozen mask model
    whose masked spectrum the student matches (knowledge distillation,
    ``cli.train --distill_from``); ``distill_weight`` scales the term.
    The teacher term enters the val total too, keeping best-val selection
    on the optimized objective.
    """

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, noisy_audio, clean_audio):
        def loss_fn(params):
            total, losses, new_bs = _mask_losses(
                state, params, noisy_audio, clean_audio, train=True,
                si_sdr_weight=si_sdr_weight, si_sdr_clamp=si_sdr_clamp,
                teacher=teacher, distill_weight=distill_weight,
                distill_feat_weight=distill_feat_weight,
            )
            return total, (losses, new_bs)

        (_, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            losses,
        )

    @jax.jit
    def eval_step(state: TrainState, noisy_audio, clean_audio):
        _, losses, _ = _mask_losses(
            state, state.params, noisy_audio, clean_audio, train=False,
            si_sdr_weight=si_sdr_weight, si_sdr_clamp=si_sdr_clamp,
            teacher=teacher, distill_weight=distill_weight,
            distill_feat_weight=distill_feat_weight,
        )
        return losses

    return train_step, eval_step


# spectral-only default steps (si_sdr_weight=0): the round-2 objective
mask_train_step, mask_eval_step = make_mask_steps(0.0)
