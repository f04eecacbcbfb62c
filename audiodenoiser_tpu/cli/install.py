"""CLI: provision the dataset layout (the ``install.ps1`` analog, C1).

Reproduces the reference installer's data steps
(``/root/reference/install.ps1:7-118``): obtain the IRMAS training archive
(download, or a local ``--archive`` for air-gapped machines), flatten every
``.wav`` inside into ``data/train/clean``, and move ``--test_count``
randomly chosen files to ``data/test/clean``. Python environment setup is
handled by ``pip install -e .`` (pyproject.toml) instead of the
PowerShell venv dance.

Usage:
  python -m audiodenoiser_tpu.cli.install --archive IRMAS-TrainingData.zip
  python -m audiodenoiser_tpu.cli.install            # downloads from Zenodo
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import zipfile

IRMAS_URL = "https://zenodo.org/record/1290750/files/IRMAS-TrainingData.zip"


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Provision the dataset layout")
    p.add_argument("--archive", default=None, help="local IRMAS zip (skips download)")
    p.add_argument("--url", default=IRMAS_URL)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--test_count", type=int, default=5)
    p.add_argument("--seed", type=int, default=None)
    return p.parse_args(argv)


def provision(archive: str, data_dir: str, test_count: int = 5,
              seed: int | None = None) -> tuple[int, int]:
    """Unpack+flatten the archive; returns (n_train, n_test) wav counts."""
    train_clean = os.path.join(data_dir, "train", "clean")
    test_clean = os.path.join(data_dir, "test", "clean")
    for d in (train_clean, test_clean,
              os.path.join(data_dir, "train", "noise"),
              os.path.join(data_dir, "test", "noise")):
        os.makedirs(d, exist_ok=True)

    with zipfile.ZipFile(archive) as zf:
        wavs = [n for n in zf.namelist() if n.lower().endswith(".wav")]
        for name in wavs:
            # flatten: basename only (install.ps1 moves all wavs into one dir)
            dst = os.path.join(train_clean, os.path.basename(name))
            with zf.open(name) as src, open(dst, "wb") as out:
                shutil.copyfileobj(src, out)

    all_train = sorted(
        f for f in os.listdir(train_clean) if f.lower().endswith(".wav")
    )
    rng = random.Random(seed)
    test_files = rng.sample(all_train, min(test_count, len(all_train)))
    for f in test_files:
        shutil.move(os.path.join(train_clean, f), os.path.join(test_clean, f))
    n_train = len(all_train) - len(test_files)
    return n_train, len(test_files)


def main(argv=None):
    args = parse_args(argv)
    archive = args.archive
    if archive is None:
        import urllib.request

        archive = os.path.join(args.data_dir, "IRMAS-TrainingData.zip")
        os.makedirs(args.data_dir, exist_ok=True)
        print(f"Downloading {args.url} ...")
        try:
            urllib.request.urlretrieve(args.url, archive)
        except Exception as e:  # zero-egress environments
            raise SystemExit(
                f"download failed ({e}); fetch the archive manually and pass "
                f"--archive /path/to/IRMAS-TrainingData.zip"
            )
    n_train, n_test = provision(
        archive, args.data_dir, args.test_count, args.seed
    )
    print(f"Provisioned {n_train} train and {n_test} test clean wavs under "
          f"{args.data_dir}. Place noise wavs in data/{{train,test}}/noise.")


if __name__ == "__main__":
    main()
