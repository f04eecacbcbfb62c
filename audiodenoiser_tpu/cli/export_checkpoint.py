"""CLI: convert ``.ckpt`` exports to reference PyTorch ``.pth`` files.

The inverse of :mod:`audiodenoiser_tpu.cli.import_checkpoint`: models
trained in this framework become drop-in checkpoints for the reference's
eval script (``/root/reference/code/test.py:59-65`` expects
``saved_models/unet_denoiser_{noise}.pth`` state_dicts) and any other
torch tooling — the two-way half of the migration story.

Usage:
  python -m audiodenoiser_tpu.cli.export_checkpoint model.ckpt model.pth
  python -m audiodenoiser_tpu.cli.export_checkpoint --saved_models_dir ./saved_models
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert .ckpt checkpoints to .pth")
    p.add_argument("src", nargs="?", help="source .ckpt file")
    p.add_argument("dst", nargs="?", help="destination .pth file")
    p.add_argument(
        "--saved_models_dir",
        default=None,
        help="convert every unet_denoiser_*.ckpt in this directory in place",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.train.checkpoints import load_exported
    from audiodenoiser_tpu.train.torch_export import save_pth

    jobs = []
    if args.saved_models_dir:
        for f in sorted(os.listdir(args.saved_models_dir)):
            if f.startswith("unet_denoiser_") and f.endswith(".ckpt"):
                src = os.path.join(args.saved_models_dir, f)
                jobs.append((src, src[: -len(".ckpt")] + ".pth"))
    elif args.src and args.dst:
        jobs.append((args.src, args.dst))
    else:
        raise SystemExit("provide SRC DST or --saved_models_dir")

    for src, dst in jobs:
        save_pth(load_exported(src), dst)
        print(f"converted {src} -> {dst}")
    if not jobs:
        print("nothing to convert")


if __name__ == "__main__":
    main()
