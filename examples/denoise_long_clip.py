"""Example: denoise an arbitrarily long WAV with sequence parallelism.

  python examples/denoise_long_clip.py noisy_long.wav denoised.wav \
      --saved_models_dir ./saved_models --noise_type white --devices 8

The spectrogram's time axis is sharded across the device mesh
(``parallel.spatial``): each chip forwards only ``T / n_devices`` frames
(plus a receptive-field halo exchanged over ICI with ``ppermute``), so
per-chip activation memory stays constant as the clip grows — hours of
audio denoise in one pass where the reference's single-device whole-clip
forward (``/root/reference/code/test.py:100-114``) would OOM.

On a single chip this degenerates to an ordinary forward; to try the
multi-device path without hardware:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/denoise_long_clip.py ...
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_wav")
    p.add_argument("output_wav")
    p.add_argument("--saved_models_dir", default="./saved_models")
    p.add_argument("--noise_type", default="white")
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: all available devices)")
    p.add_argument("--halo", type=int, default=96,
                   help="boundary frames exchanged per side; 96 covers the "
                        "U-Net's receptive field exactly")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.data.wav_io import read_wav, write_wav
    from audiodenoiser_tpu.eval.runner import load_model_for_noise
    from audiodenoiser_tpu.parallel.spatial import (
        denoise_waveform_sharded,
        make_seq_mesh,
    )

    model, variables = load_model_for_noise(args.noise_type, args.saved_models_dir)
    mesh = make_seq_mesh(args.devices)
    audio, sr = read_wav(args.input_wav, sample_rate=args.sample_rate)

    out = np.asarray(
        denoise_waveform_sharded(
            model, variables, jnp.asarray(audio), mesh, halo=args.halo,
            precision="pallas" if jax.default_backend() == "tpu" else "fft",
        )
    )
    write_wav(args.output_wav, out, sr)
    print(
        f"wrote {args.output_wav} ({len(out) / sr:.2f}s) — time axis sharded "
        f"over {mesh.shape['seq']} device(s)"
    )


if __name__ == "__main__":
    main()
