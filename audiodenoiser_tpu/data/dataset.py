"""Spectrogram-pair dataset over ``.npy`` artifacts + host batching.

Drop-in capability match for ``SpectrogramDataset``
(``/root/reference/code/data_loader.py:7-72``): pairs ``clean_*``/``noisy_*``
files by sorted listing, asserts equal counts, and reproduces the loader's
quirky float16 round-trip cast (``data_loader.py:41-42``) and the (256, 64)
pad-or-truncate. Emits NHWC ``(F, T, 1)`` float32 — this framework's native
layout — instead of torch's ``(1, F, T)``.

Also provides the ``subset_fraction`` option the reference's train CLI
declares (``train.py:57``) but its shipped loader never implements
(SURVEY.md §1 breakage note 1), and a deterministic 90/10 split standing in
for ``torch.utils.data.random_split`` (``train.py:111-114``).
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Iterator, Sequence

import numpy as np

from audiodenoiser_tpu.data.chunking import pad_or_truncate


class SpectrogramPairs:
    def __init__(
        self,
        data_dir: str,
        target_size: tuple[int, int] = (256, 64),
        subset_fraction: float = 1.0,
        seed: int = 0,
        float16_roundtrip: bool = True,
    ):
        self.target_size = target_size
        self.float16_roundtrip = float16_roundtrip
        clean = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.startswith("clean") and f.endswith(".npy")
        )
        noisy = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.startswith("noisy") and f.endswith(".npy")
        )
        assert len(clean) == len(noisy), f"Mismatch in {data_dir}"
        pairs = list(zip(noisy, clean))
        if subset_fraction < 1.0:
            keep = max(1, int(len(pairs) * subset_fraction))
            rng = np.random.default_rng(seed)
            idx = rng.permutation(len(pairs))[:keep]
            pairs = [pairs[i] for i in sorted(idx)]
        self.pairs = pairs

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        noisy_path, clean_path = self.pairs[idx]
        noisy = np.load(noisy_path)
        clean = np.load(clean_path)
        if self.float16_roundtrip:  # data_loader.py:41-42 lossy cast, kept
            noisy = noisy.astype(np.float16)
            clean = clean.astype(np.float16)
        noisy = pad_or_truncate(noisy.astype(np.float32), self.target_size)
        clean = pad_or_truncate(clean.astype(np.float32), self.target_size)
        return noisy[..., None], clean[..., None]  # NHWC


def split_train_val(
    n: int, val_ratio: float = 0.1, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic index split mirroring train.py:111-114's 90/10."""
    val_size = int(n * val_ratio)
    perm = np.random.default_rng(seed).permutation(n)
    return perm[val_size:], perm[:val_size]


def batches(
    dataset: SpectrogramPairs,
    indices: Sequence[int],
    batch_size: int,
    shuffle: bool,
    seed: int = 0,
    drop_last: bool = False,
    prefetch: int = 2,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Stacked (noisy, clean) NHWC batches with background prefetch.

    Replaces the reference's 4-worker torch DataLoader (train.py:118-119)
    with a single background thread: __getitem__ here is just np.load + pad
    (no fp16 torch tensors to pickle across processes), so one thread keeps
    a TPU step fed. Like torch's default, the trailing partial batch is
    yielded unless ``drop_last``.
    """
    idx = np.asarray(indices)
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        try:
            for s in range(0, len(idx), batch_size):
                chunk = idx[s : s + batch_size]
                if len(chunk) < batch_size and drop_last:
                    break
                items = [dataset[int(i)] for i in chunk]
                q.put(
                    (
                        np.stack([a for a, _ in items]),
                        np.stack([b for _, b in items]),
                    )
                )
            q.put(stop)
        except BaseException as e:  # surface loader failures to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
