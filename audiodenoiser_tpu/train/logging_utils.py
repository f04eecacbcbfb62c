"""Run logging: file+console logger and TensorBoard-compatible scalars.

Ports the reference's observability surface exactly (SURVEY.md §5):
``setup_logger`` mirrors ``train.py:20-39`` (file handler with
asctime-levelname-message, console handler with levelname-message), and
``ScalarWriter`` emits the same ``Loss/train`` / ``Loss/validation`` tags
(``train.py:75,89``). TensorBoard event files are written via torch's
SummaryWriter when available (the baked-in CPU torch ships one); a CSV
fallback keeps headless environments observable.
"""

from __future__ import annotations

import csv
import logging
import os


def setup_logger(log_path: str, name: str = "unet_training_logger") -> logging.Logger:
    os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
    logger = logging.getLogger(name)
    if logger.hasHandlers():
        logger.handlers.clear()
    logger.setLevel(logging.INFO)
    fh = logging.FileHandler(log_path)
    fh.setLevel(logging.INFO)
    fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setLevel(logging.INFO)
    ch.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))
    logger.addHandler(ch)
    return logger


class ScalarWriter:
    """TensorBoard scalar writer with CSV fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass
        self._csv_path = os.path.join(log_dir, "scalars.csv")
        self._csv = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._writer.writerow([tag, step, float(value)])
        self._csv.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._csv.close()
