"""CLI: convert reference PyTorch ``.pth`` checkpoints to ``.ckpt`` exports.

Bridges the reference's trained ensembles into this framework offline (the
eval CLI also loads ``.pth`` files directly; this tool materializes the
converted form for faster startup).

Usage:
  python -m audiodenoiser_tpu.cli.import_checkpoint model.pth model.ckpt
  python -m audiodenoiser_tpu.cli.import_checkpoint --saved_models_dir ./saved_models
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert .pth checkpoints to .ckpt")
    p.add_argument("src", nargs="?", help="source .pth file")
    p.add_argument("dst", nargs="?", help="destination .ckpt file")
    p.add_argument(
        "--saved_models_dir",
        default=None,
        help="convert every unet_denoiser_*.pth in this directory in place",
    )
    p.add_argument(
        "--quantize", action="store_true",
        help="store conv kernels as per-channel int8 (~4x smaller export)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.train.checkpoints import export_model
    from audiodenoiser_tpu.train.torch_import import load_pth

    jobs = []
    if args.saved_models_dir:
        for f in sorted(os.listdir(args.saved_models_dir)):
            if f.startswith("unet_denoiser_") and f.endswith(".pth"):
                src = os.path.join(args.saved_models_dir, f)
                jobs.append((src, src[: -len(".pth")] + ".ckpt"))
    elif args.src and args.dst:
        jobs.append((args.src, args.dst))
    else:
        raise SystemExit("provide SRC DST or --saved_models_dir")

    for src, dst in jobs:
        payload = load_pth(src)
        export_model(dst, payload["params"], payload["batch_stats"],
                     quantize=args.quantize)
        print(f"converted {src} -> {dst}" + (" (int8)" if args.quantize else ""))
    if not jobs:
        print("nothing to convert")


if __name__ == "__main__":
    main()
