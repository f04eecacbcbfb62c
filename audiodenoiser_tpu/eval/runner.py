"""Inference / evaluation: fused denoise graphs + reference-parity eval.

Reference: ``/root/reference/code/test.py`` — per noise type it loads a
specialized checkpoint (``test.py:54-68``), Griffin-Lim-reconstructs a few
noisy clips on the CPU, pushes the whole test set through the model in one
``no_grad`` forward, computes the combined loss, and writes
``{nt}_metrics.txt`` / wavs / 3-panel magma PNGs (``test.py:74-175``).

TPU-first redesign: ``DenoiserRunner`` compiles the *entire* pipeline —
STFT -> U-Net -> reconstruction — into one jitted graph per input shape, so
waveform-in/waveform-out denoising never leaves the device
(BASELINE.json north star). Reconstruction modes:

- ``noisy_phase``: denoised magnitude + the noisy input's phase, one iSTFT
  (fast path; also the quality-preferred masking approach);
- ``griffin_lim``: true Griffin-Lim from the denoised magnitude;
- ``reference_gl``: the reference's non-magnitude-reimposing loop
  (``test.py:39-46``), for behavioral parity;
- ``complex_mask``: bounded complex-ratio masking (requires a
  ComplexMaskUNet) — magnitude AND phase corrected, one iSTFT.

``precision='pallas'`` lowers the STFT/iSTFT through the fused TPU kernels
in ``ops/pallas`` (the benchmark default on TPU).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import audiodenoiser_tpu.dsp.stft as stft_lib
from audiodenoiser_tpu.dsp.griffin_lim import griffin_lim
from audiodenoiser_tpu.eval.metrics import pesq, si_sdr, stoi
from audiodenoiser_tpu.losses import combined_perceptual_loss
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train.checkpoints import load_exported


@jax.jit
def identity_bypass(
    out: jax.Array, orig: jax.Array, thresh_db: jax.Array
) -> jax.Array:
    """Bit-exact pass-through for clips the model barely changed.

    SI-SDR is unbounded on clips a stochastic corruption left untouched
    (a gate-never-fired ``noise_cancellation`` clip scores ~100 dB against
    its clean source); any finite-precision reconstruction caps that at
    the model's own pass-through fidelity (~60 dB measured). This gate
    restores the input verbatim wherever the model's change energy
    ``10*log10(||out-orig||^2 / ||orig||^2)`` is below ``-thresh_db`` —
    i.e. the model itself judged the clip already clean. Measured on the
    nc eval set the two populations are separated by ~50 dB (corrected
    clips sit at >= -5.4 dB, untouched ones at <= -53 dB), so the gate is
    a quality no-op on every clip the model actually denoises.
    """
    diff = jnp.sum(jnp.square(out - orig), axis=-1)
    ref = jnp.sum(jnp.square(orig), axis=-1)
    change_db = 10.0 * jnp.log10(diff / (ref + 1e-12) + 1e-20)
    return jnp.where((change_db < -thresh_db)[..., None], orig, out)


def batch_metric_mean(fn, clean, audio, sample_rate) -> float:
    """Mean of a per-clip metric with PER-CLIP degenerate-input skipping.

    STOI/PESQ raise ValueError on clips their analysis windows cannot
    score (too short, silent reference); one such clip must drop out of
    the average, not abort the metric for the whole eval set. Raises only
    if NO clip is scorable (so callers' existing guards still apply)."""
    vals = []
    for i in range(clean.shape[0]):
        try:
            vals.append(fn(clean[i], audio[i], sample_rate))
        except ValueError:
            continue
    if not vals:
        raise ValueError("no clip scorable")
    return float(np.mean(vals))


def load_model_for_noise(
    noise_type: str,
    saved_models_dir: str = "./saved_models",
    dtype=jnp.bfloat16,
    model: UNet | None = None,
    stem: str = "unet_denoiser",
):
    """Load the specialized model (test.py:54-68 analog).

    Accepts this framework's ``{stem}_{nt}.ckpt`` msgpack export OR a
    reference ``unet_denoiser_{nt}.pth`` torch state_dict (converted on the
    fly via ``train.torch_import``) — drop-in for existing ensembles. Use
    ``stem='mask_denoiser'`` with a ``ComplexMaskUNet`` model for the
    complex-mask family.
    """
    path = os.path.join(saved_models_dir, f"{stem}_{noise_type}.ckpt")
    pth_path = os.path.join(saved_models_dir, f"unet_denoiser_{noise_type}.pth")
    if (
        stem == "unet_denoiser"
        and not os.path.exists(path)
        and os.path.exists(pth_path)
    ):
        from audiodenoiser_tpu.train.torch_import import load_pth

        payload = load_pth(pth_path)
        if model is None:
            model = UNet(dtype=dtype)
        print(f"Loaded model for noise type '{noise_type}' from: {pth_path}")
        return model, {
            "params": payload["params"],
            "batch_stats": payload["batch_stats"],
        }
    return load_model_from_path(path, dtype=dtype, model=model, stem=stem)


def load_model_from_path(
    path: str,
    dtype=jnp.bfloat16,
    model: UNet | None = None,
    stem: str = "mask_denoiser",
):
    """Load a ``.ckpt`` export by direct path, rebuilding the architecture
    from its ``.json`` sidecar (width_mult, mask head). Used by
    ``load_model_for_noise`` and by ``cli.train --distill_from`` (the
    distillation teacher is named by path, not by noise type)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Model file not found: {path}")
    if model is None:
        # sidecar written by cli.train: architecture hyperparameters the
        # checkpoint alone cannot convey (mask bound / residual head for
        # the mask family; width_mult for compact students of either
        # family)
        meta = {}
        sidecar = os.path.splitext(path)[0] + ".json"
        if os.path.exists(sidecar):
            import json

            with open(sidecar) as f:
                meta = json.load(f)
        from audiodenoiser_tpu.models.unet import width_kwargs

        kwargs = width_kwargs(float(meta.get("width_mult", 1.0)))
        if meta.get("attn_bottleneck"):
            kwargs["attn_bottleneck"] = True
        if meta.get("s2d_stem"):
            kwargs["s2d_stem"] = True
        if meta.get("s2d_skip"):
            kwargs["s2d_skip"] = int(meta["s2d_skip"])
        if stem == "mask_denoiser":
            from audiodenoiser_tpu.models import ComplexMaskUNet

            kwargs["mask_bound"] = float(meta.get("mask_bound", 2.0))
            kwargs["residual"] = bool(meta.get("residual", False))
            model = ComplexMaskUNet(dtype=dtype, **kwargs)
        else:
            model = UNet(dtype=dtype, **kwargs)
    in_ch = 3 if stem == "mask_denoiser" else 1
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, in_ch)))
    )
    template = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), template)
    payload = load_exported(path, {"params": template["params"],
                                   "batch_stats": template["batch_stats"]})
    print(f"Loaded model from: {path}")
    return model, {"params": payload["params"], "batch_stats": payload["batch_stats"]}


class DenoiserRunner:
    """Jitted spectrogram-denoise and fused waveform-denoise graphs.

    Pass ``mesh`` (a ('data','model') ``jax.sharding.Mesh`` from
    ``parallel.make_mesh``) to scale inference over a device mesh: the
    batch dimension shards over 'data' and the wide conv kernels channel-TP
    shard over 'model' — the same SPMD layout training uses (reference is
    strictly single-device, SURVEY.md §2). Batches not divisible by the
    data axis are zero-padded on dispatch and trimmed on return. The mesh
    path expects eager (non-traced) calls.
    """

    def __init__(
        self,
        model: UNet,
        variables,
        n_fft: int = 512,
        hop_length: int = 128,
        precision: str = "fft",  # "fft" | "pallas" STFT/iSTFT lowering
        mesh=None,  # jax.sharding.Mesh | None
    ):
        self.model = model
        self.n_fft = n_fft
        self.hop = hop_length
        self.precision = precision
        self.mesh = mesh
        if mesh is not None:
            from audiodenoiser_tpu.parallel import shard_variables

            variables = shard_variables(variables, mesh)
        self.variables = variables

    def _pad_and_shard(self, x: jax.Array):
        """Zero-pad batch to a multiple of the data axis and place it."""
        from audiodenoiser_tpu.parallel import batch_sharding

        n = x.shape[0]
        d = self.mesh.shape["data"]
        pad = (-n) % d
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0
            )
        return jax.device_put(x, batch_sharding(self.mesh, x.ndim)), n

    def denoise_spectrogram(self, noisy_mag: jax.Array) -> jax.Array:
        """(N, F, T) magnitudes -> (N, F, T) denoised magnitudes."""
        if self.mesh is None:
            return self._denoise_spectrogram(noisy_mag)
        x, n = self._pad_and_shard(noisy_mag)
        return self._denoise_spectrogram(x)[:n]

    def denoise_audio(
        self,
        audio: jax.Array,  # (..., samples)
        key: jax.Array,
        mode: str = "noisy_phase",
        gl_iters: int = 50,
        center: bool = True,
        bypass_db: Optional[float] = None,
    ) -> jax.Array:
        """Fused STFT -> U-Net -> reconstruction, one compiled graph.

        Inputs are zero-padded up to a hop multiple before the STFT: the
        iSTFT of a center=True STFT only reconstructs ``floor(n/hop)*hop``
        samples (librosa semantics), so without alignment the final
        ``n mod hop`` output samples would be silent — a ~21-26 dB
        SI-SDR ceiling on typical clips, measured in round 3.

        ``bypass_db`` enables the :func:`identity_bypass` gate: clips whose
        relative change energy is below ``-bypass_db`` are returned
        verbatim (bit-exact pass-through on clips the model judged clean).
        """
        orig = audio
        n = audio.shape[-1]
        rem = (-n) % self.hop
        if rem and center:
            pads = [(0, 0)] * (audio.ndim - 1) + [(0, rem)]
            audio = jnp.pad(audio, pads)
        if self.mesh is None or audio.ndim < 2:
            out = self._denoise_audio(
                audio, key, mode=mode, gl_iters=gl_iters, center=center
            )
        else:
            x, b = self._pad_and_shard(audio)
            out = self._denoise_audio(
                x, key, mode=mode, gl_iters=gl_iters, center=center
            )[:b]
        out = out[..., :n] if (rem and center) else out
        if bypass_db is not None:
            out = identity_bypass(out, orig, jnp.float32(bypass_db))
        return out

    @functools.partial(jax.jit, static_argnames=("self",))
    def _denoise_spectrogram(self, noisy_mag: jax.Array) -> jax.Array:
        out = self.model.apply(self.variables, noisy_mag[..., None], train=False)
        return out[..., 0]

    @functools.partial(
        jax.jit, static_argnames=("self", "mode", "gl_iters", "center")
    )
    def _denoise_audio(
        self,
        audio: jax.Array,
        key: jax.Array,
        mode: str = "noisy_phase",
        gl_iters: int = 50,
        center: bool = True,
    ) -> jax.Array:
        spec = stft_lib.stft(
            audio, self.n_fft, self.hop, center=center, precision=self.precision
        )
        if mode == "complex_mask":
            # model must be a ComplexMaskUNet: stft -> mask -> single iSTFT
            from audiodenoiser_tpu.models.complex_mask import (
                apply_mask,
                spectrogram_features,
            )

            feats = spectrogram_features(spec)
            cmask = self.model.apply(self.variables, feats, train=False)
            rec = apply_mask(cmask, spec)
            return stft_lib.istft(
                rec, self.hop, n_fft=self.n_fft, center=center,
                length=audio.shape[-1], precision=self.precision,
            )
        mag, phase = stft_lib.magphase(spec)
        den = self.model.apply(self.variables, mag[..., None], train=False)[..., 0]
        den = jnp.maximum(den, 0.0)  # magnitudes are non-negative
        if mode == "noisy_phase":
            rec = den.astype(jnp.complex64) * phase
            return stft_lib.istft(
                rec, self.hop, n_fft=self.n_fft, center=center,
                length=audio.shape[-1], precision=self.precision,
            )
        if mode in ("griffin_lim", "reference_gl"):
            gl_mode = "correct" if mode == "griffin_lim" else "reference"
            return griffin_lim(
                den, key, n_fft=self.n_fft, hop_length=self.hop,
                n_iter=gl_iters, mode=gl_mode, length=audio.shape[-1],
            )
        raise ValueError(f"unknown mode {mode!r}")

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _plot_comparison(noisy, denoised, clean, path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # plots are the optional [plots] extra
        import warnings

        warnings.warn("matplotlib unavailable; skipping spectrogram PNGs")
        return

    plt.figure(figsize=(12, 6))
    for pos, (spec, title) in enumerate(
        [(noisy, "Noisy Spectrogram"), (denoised, "Denoised Spectrogram"),
         (clean, "Clean Spectrogram")],
        start=1,
    ):
        plt.subplot(1, 3, pos)
        plt.title(title)
        plt.imshow(spec, aspect="auto", origin="lower", cmap="magma")
        plt.colorbar(format="%+2.0f dB")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def test_single_noise_type(
    model: UNet,
    variables,
    noise_type: str,
    test_data_dir: str,
    output_dir: str,
    sample_rate: int = 8000,
    n_fft: int = 512,
    hop_length: int = 128,
    num_audio_examples: int = 5,
    gl_mode: str = "reference_gl",
    seed: int = 0,
    compute_si_sdr: bool = True,
    eval_batch_size: int = 64,
    mesh=None,
) -> Optional[dict]:
    """Reference-parity per-noise-type evaluation (test.py:74-175).

    Writes {nt}_noisy_{i}.wav, {nt}_denoised_{i}.wav, {nt}_metrics.txt, and
    {nt}_spectrogram_{i}.png with reference-identical names; returns the
    metric dict (plus SI-SDR, an extension).
    """
    from audiodenoiser_tpu.data.wav_io import write_wav

    print(f"\n=== Testing model on noise type: {noise_type} ===")
    clean_path = os.path.join(test_data_dir, f"clean_{noise_type}.npy")
    noisy_path = os.path.join(test_data_dir, f"noisy_{noise_type}.npy")
    if not (os.path.exists(clean_path) and os.path.exists(noisy_path)):
        print(f"Skipping {noise_type}, missing {clean_path} or {noisy_path}")
        return None

    clean = np.load(clean_path)  # (N, F, T)
    noisy = np.load(noisy_path)
    n = len(noisy)
    print(f"Found {n} test samples for noise type '{noise_type}'")
    os.makedirs(output_dir, exist_ok=True)

    runner = DenoiserRunner(model, variables, n_fft, hop_length, mesh=mesh)
    key = jax.random.key(seed)

    # few noisy reconstructions (test.py:103-109)
    k = min(num_audio_examples, n)
    if k > 0:
        noisy_audio = np.asarray(
            griffin_lim(
                jnp.asarray(noisy[:k]), key,
                n_fft=n_fft, hop_length=hop_length, n_iter=50,
                mode="reference" if gl_mode == "reference_gl" else "correct",
            )
        )
        for i in range(k):
            write_wav(
                os.path.join(output_dir, f"{noise_type}_noisy_{i}.wav"),
                noisy_audio[i], sample_rate,
            )

    # the reference forwards the whole test set at once (test.py:112-114),
    # which scales poorly; batch it, padding the tail to avoid a second
    # XLA specialization
    if n <= eval_batch_size:
        denoised = np.asarray(runner.denoise_spectrogram(jnp.asarray(noisy)))
    else:
        outs = []
        for s in range(0, n, eval_batch_size):
            chunk = noisy[s : s + eval_batch_size]
            pad = eval_batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            out = np.asarray(runner.denoise_spectrogram(jnp.asarray(chunk)))
            outs.append(out[: eval_batch_size - pad])
        denoised = np.concatenate(outs, axis=0)

    total, s, m, l1 = combined_perceptual_loss(
        jnp.asarray(denoised)[..., None], jnp.asarray(clean)[..., None]
    )
    metrics = {
        "total": float(total), "stft": float(s), "mel": float(m), "l1": float(l1)
    }
    print(f"\nLoss metrics for noise type '{noise_type}':")
    print(f"Total Loss: {metrics['total']:.6f}")
    print(f"STFT Loss: {metrics['stft']:.6f}")
    print(f"Mel Loss: {metrics['mel']:.6f}")
    print(f"L1 Loss: {metrics['l1']:.6f}")

    if compute_si_sdr and k > 0:
        # SI-SDR of denoised-vs-clean reconstructions (noisy-phase fusion
        # for determinism), a quality extension over the reference
        clean_audio = np.asarray(
            stft_lib.istft(
                jnp.asarray(clean[:k]).astype(jnp.complex64),
                hop_length, n_fft=n_fft, center=True,
            )
        )
        den_audio = np.asarray(
            stft_lib.istft(
                jnp.asarray(denoised[:k]).astype(jnp.complex64),
                hop_length, n_fft=n_fft, center=True,
            )
        )
        metrics["si_sdr"] = float(
            np.mean(np.asarray(si_sdr(jnp.asarray(den_audio), jnp.asarray(clean_audio))))
        )
        print(f"SI-SDR (mag-only recon): {metrics['si_sdr']:.3f} dB")

    # TRUE SI-SDR when the builder saved waveform artifacts (save_audio,
    # the default): denoised magnitude + the actual noisy phase -> one
    # iSTFT, scored against the real clean waveform. The reference's
    # magnitude-only npy artifacts cannot support this (no phase anywhere).
    na_path = os.path.join(test_data_dir, f"noisy_audio_{noise_type}.npy")
    ca_path = os.path.join(test_data_dir, "clean_audio.npy")
    if compute_si_sdr and os.path.exists(na_path) and os.path.exists(ca_path):
        noisy_audio = np.load(na_path)
        clean_audio_true = np.load(ca_path)

        @jax.jit
        def _noisy_phase_recon(mag, naud):
            spec = stft_lib.stft(naud, n_fft, hop_length, center=True)
            _, phase = stft_lib.magphase(spec)
            t = min(mag.shape[-1], phase.shape[-1])
            rec = (
                jnp.maximum(mag[..., :t], 0.0).astype(jnp.complex64)
                * phase[..., :t]
            )
            return stft_lib.istft(
                rec, hop_length, n_fft=n_fft, center=True,
                length=naud.shape[-1],
            )

        recon = np.asarray(
            _noisy_phase_recon(jnp.asarray(denoised), jnp.asarray(noisy_audio))
        )
        # the artifact spectrograms fix the frame count, so the iSTFT only
        # covers (T-1)*hop samples (librosa trim semantics) — score BOTH
        # signals on the covered region so the recon isn't penalized for a
        # tail the artifacts cannot represent
        covered = max(hop_length, (denoised.shape[-1] - 1) * hop_length)
        covered = min(covered, recon.shape[-1])
        metrics["si_sdr_noisy_phase"] = float(np.mean(np.asarray(
            si_sdr(jnp.asarray(recon[..., :covered]),
                   jnp.asarray(clean_audio_true[..., :covered]))
        )))
        metrics["si_sdr_noisy_input"] = float(np.mean(np.asarray(
            si_sdr(jnp.asarray(noisy_audio[..., :covered]),
                   jnp.asarray(clean_audio_true[..., :covered]))
        )))
        print(
            f"SI-SDR (noisy-phase recon vs clean waveform): "
            f"{metrics['si_sdr_noisy_input']:.3f} -> "
            f"{metrics['si_sdr_noisy_phase']:.3f} dB"
        )
        try:
            metrics["pesq_noisy_input"] = batch_metric_mean(
                pesq, clean_audio_true[:, :covered],
                noisy_audio[:, :covered], sample_rate,
            )
            metrics["pesq_noisy_phase"] = batch_metric_mean(
                pesq, clean_audio_true[:, :covered], recon[:, :covered],
                sample_rate,
            )
            print(
                f"PESQ-approx (noisy-phase recon vs clean waveform): "
                f"{metrics['pesq_noisy_input']:.3f} -> "
                f"{metrics['pesq_noisy_phase']:.3f}"
            )
        except ValueError as e:
            print(f"PESQ skipped: {e}")

    with open(os.path.join(output_dir, f"{noise_type}_metrics.txt"), "w") as f:
        f.write(f"Perceptual metrics for noise type '{noise_type}':\n")
        f.write(f"Total Loss: {metrics['total']:.6f}\n")
        f.write(f"STFT Loss: {metrics['stft']:.6f}\n")
        f.write(f"Mel Loss: {metrics['mel']:.6f}\n")
        f.write(f"L1 Loss: {metrics['l1']:.6f}\n")
        if "si_sdr" in metrics:
            # labeled explicitly: this is a spectral-reconstruction proxy
            # (zero-phase iSTFT of magnitudes — the reference npy set
            # stores no phase/waveform)
            f.write(f"SI-SDR (mag-only recon): {metrics['si_sdr']:.3f} dB\n")
        if "si_sdr_noisy_phase" in metrics:
            f.write(
                f"SI-SDR (noisy input): "
                f"{metrics['si_sdr_noisy_input']:.3f} dB\n"
            )
            f.write(
                f"SI-SDR (noisy-phase recon): "
                f"{metrics['si_sdr_noisy_phase']:.3f} dB\n"
            )
        if "pesq_noisy_phase" in metrics:
            f.write(
                f"PESQ-approx (noisy input): {metrics['pesq_noisy_input']:.3f}\n"
            )
            f.write(
                f"PESQ-approx (noisy-phase recon): "
                f"{metrics['pesq_noisy_phase']:.3f}\n"
            )

    # denoised reconstructions (test.py:141-148)
    if k > 0:
        den_audio_gl = np.asarray(
            griffin_lim(
                jnp.asarray(np.maximum(denoised[:k], 0.0)), key,
                n_fft=n_fft, hop_length=hop_length, n_iter=50,
                mode="reference" if gl_mode == "reference_gl" else "correct",
            )
        )
        for i in range(k):
            write_wav(
                os.path.join(output_dir, f"{noise_type}_denoised_{i}.wav"),
                den_audio_gl[i], sample_rate,
            )

    for i in range(k):
        _plot_comparison(
            noisy[i], denoised[i], clean[i],
            os.path.join(output_dir, f"{noise_type}_spectrogram_{i}.png"),
        )
    return metrics


def test_noise_type_waveform(
    model,
    variables,
    noise_type: str,
    clean_dir: str,
    noise_dir: str,
    output_dir: str,
    mode: str = "complex_mask",
    sample_rate: int = 8000,
    n_fft: int = 512,
    hop_length: int = 128,
    snr_db: float = 8.0,
    reverb_wet_level: float = 0.35,
    num_audio_examples: int = 5,
    seed: int = 0,
    mesh=None,
    bypass_db: Optional[float] = 40.0,
    write_artifacts: bool = True,
    runner: Optional["DenoiserRunner"] = None,
) -> Optional[dict]:
    """Waveform-domain evaluation: corrupt test wavs on device, denoise
    through the fused graph, score SI-SDR + the combined spectral loss.

    This is the eval path for model families that need the complex STFT
    (the mask model) — the reference's ``.npy`` artifacts store magnitudes
    only. Writes ``{nt}_metrics.txt`` and example wavs like the
    magnitude-path eval. ``bypass_db`` (default 40, ``None``/<=0 disables)
    applies the :func:`identity_bypass` gate so untouched clips pass
    through bit-exactly.
    """
    from audiodenoiser_tpu.data.builders import _corrupt_and_featurize
    from audiodenoiser_tpu.data.pipeline import NoiseBank
    from audiodenoiser_tpu.data.wav_io import load_wav_list, read_wav, write_wav

    print(f"\n=== Waveform eval ({mode}) on noise type: {noise_type} ===")
    clean_files = load_wav_list(clean_dir)
    if not clean_files:
        print(f"Skipping {noise_type}, no wavs in {clean_dir}")
        return None
    clips = [read_wav(f, sample_rate=sample_rate)[0] for f in clean_files]
    min_len = min(len(c) for c in clips)
    clean = jnp.asarray(np.stack([c[:min_len] for c in clips]))
    noise_files = load_wav_list(noise_dir) if os.path.isdir(noise_dir) else []
    key = jax.random.key(seed)
    segs = (
        NoiseBank(
            [read_wav(f, sample_rate=sample_rate)[0] for f in noise_files],
            target_len=min_len,
        ).sample(key, clean.shape[0])
        if (noise_files and noise_type == "urban")
        else jnp.zeros_like(clean)
    )
    noisy_audio, clean_mag, _ = _corrupt_and_featurize(
        key, clean, segs, noise_type, n_fft, hop_length, True, sample_rate,
        snr_db, reverb_wet_level,
    )

    if runner is None:
        runner = DenoiserRunner(model, variables, n_fft, hop_length, mesh=mesh)
    if bypass_db is not None and bypass_db <= 0:
        bypass_db = None
    den_audio = runner.denoise_audio(
        noisy_audio, key, mode=mode, bypass_db=bypass_db
    )
    den_mag = jnp.abs(stft_lib.stft(den_audio, n_fft, hop_length, center=True))

    total, s, m, l1 = combined_perceptual_loss(
        den_mag[..., None], clean_mag[..., None]
    )
    sdr_n_clips = np.asarray(si_sdr(noisy_audio, clean))
    sdr_d_clips = np.asarray(si_sdr(den_audio, clean))
    sdr_noisy = float(sdr_n_clips.mean())
    sdr_den = float(sdr_d_clips.mean())
    # SI-SDR is UNBOUNDED on clips a stochastic corruption left untouched
    # (a gate-never-fired noise_cancellation clip scores ~100 dB, which no
    # finite-precision reconstruction can preserve), so the plain mean is
    # degenerate for gated corruptions. Report the standard robust
    # aggregates alongside: per-clip clamp at 30 dB (≈ perceptual
    # transparency, where SI-SDR saturates) and the median.
    clamp = 30.0
    metrics = {
        "total": float(total), "stft": float(s), "mel": float(m),
        "l1": float(l1), "si_sdr_noisy": sdr_noisy, "si_sdr": sdr_den,
        "si_sdr30_noisy": float(np.minimum(sdr_n_clips, clamp).mean()),
        "si_sdr30": float(np.minimum(sdr_d_clips, clamp).mean()),
        "si_sdr_median_noisy": float(np.median(sdr_n_clips)),
        "si_sdr_median": float(np.median(sdr_d_clips)),
    }
    print(f"Total Loss: {metrics['total']:.6f}")
    print(f"SI-SDR: {sdr_noisy:.3f} dB (noisy) -> {sdr_den:.3f} dB (denoised)")
    print(
        f"SI-SDR (clamped@30): {metrics['si_sdr30_noisy']:.3f} -> "
        f"{metrics['si_sdr30']:.3f} dB | median: "
        f"{metrics['si_sdr_median_noisy']:.3f} -> "
        f"{metrics['si_sdr_median']:.3f} dB"
    )
    clean_np = np.asarray(clean)
    noisy_host = np.asarray(noisy_audio)
    den_host = np.asarray(den_audio)
    try:  # per-clip degenerate inputs drop out of the mean
        metrics["stoi_noisy"] = batch_metric_mean(
            stoi, clean_np, noisy_host, sample_rate
        )
        metrics["stoi"] = batch_metric_mean(
            stoi, clean_np, den_host, sample_rate
        )
        print(
            f"STOI: {metrics['stoi_noisy']:.4f} (noisy) -> "
            f"{metrics['stoi']:.4f} (denoised)"
        )
    except ValueError as e:  # every clip too short/silent
        print(f"STOI skipped: {e}")
    try:
        metrics["pesq_noisy"] = batch_metric_mean(
            pesq, clean_np, noisy_host, sample_rate
        )
        metrics["pesq"] = batch_metric_mean(
            pesq, clean_np, den_host, sample_rate
        )
        print(
            f"PESQ-approx: {metrics['pesq_noisy']:.3f} (noisy) -> "
            f"{metrics['pesq']:.3f} (denoised)"
        )
    except ValueError as e:  # every clip shorter than the 64 ms minimum
        print(f"PESQ skipped: {e}")

    if not write_artifacts:  # multi-seed repeats: metrics only
        return metrics
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, f"{noise_type}_metrics.txt"), "w") as f:
        f.write(f"Waveform-domain metrics ({mode}) for noise type '{noise_type}':\n")
        f.write(f"Total Loss: {metrics['total']:.6f}\n")
        f.write(f"STFT Loss: {metrics['stft']:.6f}\n")
        f.write(f"Mel Loss: {metrics['mel']:.6f}\n")
        f.write(f"L1 Loss: {metrics['l1']:.6f}\n")
        f.write(f"SI-SDR noisy: {sdr_noisy:.3f} dB\n")
        f.write(f"SI-SDR denoised: {sdr_den:.3f} dB\n")
        f.write(f"SI-SDR clamped@30 noisy: {metrics['si_sdr30_noisy']:.3f} dB\n")
        f.write(f"SI-SDR clamped@30 denoised: {metrics['si_sdr30']:.3f} dB\n")
        f.write(
            f"SI-SDR median noisy: {metrics['si_sdr_median_noisy']:.3f} dB\n"
        )
        f.write(f"SI-SDR median denoised: {metrics['si_sdr_median']:.3f} dB\n")
        if "stoi" in metrics:
            f.write(f"STOI noisy: {metrics['stoi_noisy']:.4f}\n")
            f.write(f"STOI denoised: {metrics['stoi']:.4f}\n")
        if "pesq" in metrics:
            f.write(f"PESQ-approx noisy: {metrics['pesq_noisy']:.3f}\n")
            f.write(f"PESQ-approx denoised: {metrics['pesq']:.3f}\n")
            f.write(
                "# PESQ-approx is a calibrated approximation of ITU-T "
                "P.862, valid for\n# internal deltas only — NOT comparable "
                "to published P.862 scores.\n"
            )
    k = min(num_audio_examples, clean.shape[0])
    noisy_np, den_np = np.asarray(noisy_audio), np.asarray(den_audio)
    for i in range(k):
        write_wav(
            os.path.join(output_dir, f"{noise_type}_noisy_{i}.wav"),
            noisy_np[i], sample_rate,
        )
        write_wav(
            os.path.join(output_dir, f"{noise_type}_denoised_{i}.wav"),
            den_np[i], sample_rate,
        )
    return metrics
