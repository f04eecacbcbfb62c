"""CLI: provision the dataset layout (the ``install.ps1`` analog, C1).

Reproduces the reference installer end to end
(``/root/reference/install.ps1:7-118``): obtain the IRMAS training archive
(download, or a local ``--archive`` for air-gapped machines), flatten every
``.wav`` inside into ``data/train/clean``, move ``--test_count`` randomly
chosen files to ``data/test/clean``, and (with ``--venv PATH``) create a
virtual environment and pip-install this package into it — the one-command
provisioning story of the PowerShell installer (its venv + pip steps are
``install.ps1:~100-118``). Without ``--venv``, environment setup is left
to ``pip install -e .`` (pyproject.toml).

Usage:
  python -m audiodenoiser_tpu.cli.install --archive IRMAS-TrainingData.zip
  python -m audiodenoiser_tpu.cli.install            # downloads from Zenodo
  python -m audiodenoiser_tpu.cli.install --archive ... --venv .venv
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
    p.add_argument(
        "--venv", default=None, metavar="PATH",
        help="also create a virtual environment at PATH and pip-install "
        "this package into it (the install.ps1 venv step)",
    )
    return p.parse_args(argv)


def provision_venv(venv_path: str, package_dir: str | None = None) -> str:
    """Create a venv and pip-install the package (editable). Returns the
    venv's python executable path."""
    import subprocess
    import sys
    import venv as venv_lib

    # system-site-packages + --no-build-isolation: works in zero-egress
    # environments (the heavy deps — jax, numpy, torch — come from the
    # host site; only this package installs into the venv)
    venv_lib.EnvBuilder(with_pip=True, system_site_packages=True).create(
        venv_path
    )
    py = os.path.join(
        venv_path, "Scripts" if os.name == "nt" else "bin", "python"
    )
    # when the *invoking* interpreter is itself a venv, EnvBuilder's
    # system-site flag exposes only the BASE python's site-packages — link
    # the invoking environment's site dirs too so its installed deps
    # (setuptools, jax, ...) stay importable
    import site
    import sysconfig

    new_site = sysconfig.get_path(
        "purelib", vars={"base": os.path.abspath(venv_path),
                         "platbase": os.path.abspath(venv_path)}
    )
    host_dirs = [d for d in site.getsitepackages() if os.path.isdir(d)]
    if host_dirs and os.path.isdir(new_site):
        with open(os.path.join(new_site, "_host_site.pth"), "w") as f:
            f.write("\n".join(host_dirs) + "\n")
    if package_dir is None:
        package_dir = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    subprocess.run(
        [py, "-m", "pip", "install", "--no-build-isolation", "--no-deps",
         "-e", package_dir],
        check=True,
        stdout=sys.stdout,
        stderr=sys.stderr,
    )
    return py


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
    if args.venv:
        py = provision_venv(args.venv)
        print(f"Virtual environment ready: {py} (package installed)")


if __name__ == "__main__":
    main()
