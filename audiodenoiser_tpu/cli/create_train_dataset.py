"""CLI: build the training spectrogram dataset (reference-compatible).

Mirrors ``/root/reference/code/create_train_dataset.py`` — same default
paths/constants (``create_train_dataset.py:13-36``), same output layout
(``{output}/{noise_type}/noisy|clean_{nt}_chunk_{i}.npy`` + debug wavs) —
with the hardcoded constants exposed as flags. Featurization runs batched
on the TPU instead of per-chunk on the CPU.

Usage: ``python -m audiodenoiser_tpu.cli.create_train_dataset [flags]``
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Create the training spectrogram dataset")
    p.add_argument("--clean_dir", default="./data/train/clean")
    p.add_argument("--noise_dir", default="./data/train/noise")
    p.add_argument("--output_base", default="./data/train_processed")
    p.add_argument("--debug_dir", default="./data/debug_audio")
    p.add_argument("--chunk_seconds", type=float, default=2.0)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--n_fft", type=int, default=512)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--snr_db", type=float, default=8.0)
    p.add_argument("--num_debug_wav", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--noise_types",
        nargs="+",
        default=["white", "urban", "reverb", "noise_cancellation"],
    )
    p.add_argument("--device_batch", type=int, default=256)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(who="create_train_dataset")
    from audiodenoiser_tpu.data.builders import build_train_dataset

    n = build_train_dataset(
        clean_dir=args.clean_dir,
        noise_dir=args.noise_dir,
        output_base=args.output_base,
        chunk_seconds=args.chunk_seconds,
        sample_rate=args.sample_rate,
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        snr_db=args.snr_db,
        noise_types=tuple(args.noise_types),
        num_debug_wav=args.num_debug_wav,
        debug_dir=args.debug_dir,
        seed=args.seed,
        device_batch=args.device_batch,
    )
    print("Done! Saved 2D spectrograms in .npy for each noise type.")
    print(f"Debug WAVs are in: {args.debug_dir}")
    print("Check subdirectories in:", args.output_base, "for your spectrogram files.")
    print(f"Processed {n} chunks.")


if __name__ == "__main__":
    main()
