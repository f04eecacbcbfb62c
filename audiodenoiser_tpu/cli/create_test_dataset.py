"""CLI: build the test spectrogram dataset (reference-compatible).

Mirrors ``/root/reference/code/create_test_dataset.py`` — same default
paths/constants (``create_test_dataset.py:11-28``), same outputs
(``clean_{nt}.npy`` / ``noisy_{nt}.npy`` stacks, STFT center=True, reverb
wet_level 0.35).

Usage: ``python -m audiodenoiser_tpu.cli.create_test_dataset [flags]``
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Create the test spectrogram dataset")
    p.add_argument("--clean_dir", default="./data/test/clean")
    p.add_argument("--noise_dir", default="./data/test/noise")
    p.add_argument("--output_dir", default="./data/test_processed")
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--n_fft", type=int, default=512)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--snr_db", type=float, default=8.0)
    p.add_argument("--reverb_wet_level", type=float, default=0.35)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--noise_types",
        nargs="+",
        default=["white", "urban", "reverb", "noise_cancellation"],
    )
    p.add_argument(
        "--no_audio_artifacts", action="store_true",
        help="skip the clean_audio.npy / noisy_audio_{nt}.npy waveform "
        "stacks (beyond-reference artifacts that enable a true SI-SDR "
        "quality gate at eval time; the reference's magnitude-only npys "
        "are always written).",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(who="create_test_dataset")
    from audiodenoiser_tpu.data.builders import build_test_dataset

    for nt in args.noise_types:
        print(f"Processing noise type: {nt}")
    build_test_dataset(
        clean_dir=args.clean_dir,
        noise_dir=args.noise_dir,
        output_dir=args.output_dir,
        sample_rate=args.sample_rate,
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        snr_db=args.snr_db,
        noise_types=tuple(args.noise_types),
        reverb_wet_level=args.reverb_wet_level,
        seed=args.seed,
        save_audio=not args.no_audio_artifacts,
    )
    print("Test dataset creation is complete!")


if __name__ == "__main__":
    main()
