"""Example: denoise a WAV file end to end with a trained checkpoint.

  python examples/denoise_wav.py noisy.wav denoised.wav \
      --saved_models_dir ./saved_models --noise_type white

The whole pipeline — STFT, U-Net forward, reconstruction — runs as a
single compiled TPU program (see audiodenoiser_tpu.eval.runner). For
real-time/streaming use, see StreamingDenoiser; for a network service,
``adt-serve``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_wav")
    p.add_argument("output_wav")
    p.add_argument("--saved_models_dir", default="./saved_models")
    p.add_argument("--noise_type", default="white")
    p.add_argument("--mode", default="noisy_phase",
                   choices=["noisy_phase", "griffin_lim", "reference_gl"])
    p.add_argument("--sample_rate", type=int, default=8000)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.data.wav_io import read_wav, write_wav
    from audiodenoiser_tpu.eval.metrics import si_sdr
    from audiodenoiser_tpu.eval.runner import DenoiserRunner, load_model_for_noise

    model, variables = load_model_for_noise(args.noise_type, args.saved_models_dir)
    runner = DenoiserRunner(model, variables)

    audio, sr = read_wav(args.input_wav, sample_rate=args.sample_rate)
    out = np.asarray(
        runner.denoise_audio(jnp.asarray(audio[None]), jax.random.key(0),
                             mode=args.mode)
    )[0]
    write_wav(args.output_wav, out, sr)
    print(f"wrote {args.output_wav} ({len(out) / sr:.2f}s, mode={args.mode})")


if __name__ == "__main__":
    main()
