"""JUMP-CP cell-imaging dataset (FastChannelVim workload).

Port of the reference cell pipeline (`cell_imaging/s3dataset.py`,
`cell_imaging/datasets_supervised.py`, `cell_imaging/transformations/
cell.py`): a parquet manifest maps (plate, well, field) rows to 8-channel
.npy crops and compound-target labels; splits are a seeded 60/20/20
permutation (datasets_supervised.py:104-118); augmentation is
flip / pad-crop / coarse-dropout with per-channel normalization
(CellAugmentation). Reads retry with backoff (s3dataset.py:40-67) and bad
samples are dropped by the collate (s3dataset.py:69-73).

Local-filesystem first (point ``manifest`` at a parquet/csv with columns
``path`` and ``label``); a synthetic multi-channel dataset covers smoke
tests and benches.
"""

from __future__ import annotations

import os
import random
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np


def split_indices(n: int, split: str, seed: int = 42):
    """Seeded 60/20/20 train/val/test split (datasets_supervised.py:104-118)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(0.6 * n)
    n_val = int(0.2 * n)
    if split == "train":
        return perm[:n_train]
    if split == "val":
        return perm[n_train : n_train + n_val]
    if split == "test":
        return perm[n_train + n_val :]
    raise ValueError(split)


def cell_augment(arr: np.ndarray, rng: random.Random, size: int,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None,
                 coarse_dropout: float = 0.5,
                 training: bool = True) -> np.ndarray:
    """flip / pad-crop / coarse-dropout / per-channel normalize (HWC)."""
    H, W, C = arr.shape
    if training:
        if rng.random() < 0.5:
            arr = arr[:, ::-1]
        if rng.random() < 0.5:
            arr = arr[::-1, :]
        pad = size // 16
        arr = np.pad(arr, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        y = rng.randint(0, 2 * pad)
        x = rng.randint(0, 2 * pad)
        arr = arr[y : y + H, x : x + W]
        if rng.random() < coarse_dropout:
            for _ in range(rng.randint(1, 4)):
                h = rng.randint(H // 16, H // 8)
                w = rng.randint(W // 16, W // 8)
                yy = rng.randint(0, H - h)
                xx = rng.randint(0, W - w)
                arr = arr.copy()
                arr[yy : yy + h, xx : xx + w] = 0.0
    if arr.shape[0] != size:
        # center crop/pad to size
        if arr.shape[0] > size:
            off = (arr.shape[0] - size) // 2
            arr = arr[off : off + size, off : off + size]
        else:
            pad = size - arr.shape[0]
            arr = np.pad(arr, ((0, pad), (0, pad), (0, 0)))
    arr = arr.astype(np.float32)
    if mean is not None:
        arr = (arr - mean[None, None]) / std[None, None]
    return arr


class CellDataset:
    """Manifest-driven npy dataset with retrying reads."""

    def __init__(self, manifest: str, split: str = "train", seed: int = 42,
                 retries: int = 3, retry_wait: float = 2.0):
        import pandas as pd

        if manifest.endswith(".parquet"):
            df = pd.read_parquet(manifest)
        else:
            df = pd.read_csv(manifest)
        idx = split_indices(len(df), split, seed)
        self.rows = df.iloc[idx].reset_index(drop=True)
        self.retries = retries
        self.retry_wait = retry_wait
        self.num_classes = int(df["label"].max()) + 1

    def __len__(self):
        return len(self.rows)

    def load(self, idx: int) -> Optional[Tuple[np.ndarray, int]]:
        row = self.rows.iloc[idx]
        for attempt in range(self.retries):
            try:
                arr = np.load(row["path"])
                if arr.ndim == 3 and arr.shape[0] < arr.shape[-1]:
                    arr = arr.transpose(1, 2, 0)  # CHW → HWC
                return arr, int(row["label"])
            except Exception:
                time.sleep(self.retry_wait)
        return None  # dropped by the loader (collate-None semantics)


class SyntheticCellDataset:
    def __init__(self, num_samples: int = 256, size: int = 128,
                 channels: int = 8, num_classes: int = 161):
        self.num_samples = num_samples
        self.size = size
        self.channels = channels
        self.num_classes = num_classes

    def __len__(self):
        return self.num_samples

    def load(self, idx: int):
        rng = np.random.default_rng(idx)
        arr = rng.standard_normal(
            (self.size, self.size, self.channels)).astype(np.float32)
        return arr, idx % self.num_classes


class CellLoader:
    """Batches of {"image" (B,H,W,C), "label" (B,)}; drops failed reads."""

    def __init__(self, dataset, batch_size: int, size: int,
                 training: bool = True, seed: int = 0,
                 mean: Optional[Sequence[float]] = None,
                 std: Optional[Sequence[float]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.size = size
        self.training = training
        self.seed = seed
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)
        self.epoch = 0

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        from fastvim_tpu import native

        use_native = native.available()
        idxs = np.arange(len(self.dataset))
        if self.training:
            np.random.default_rng(self.seed + self.epoch).shuffle(idxs)
        self.epoch += 1
        for i in range(0, len(idxs) - self.batch_size + 1, self.batch_size):
            imgs, labels = [], []
            for j in idxs[i : i + self.batch_size]:
                out = self.dataset.load(int(j))
                if out is None:
                    continue
                arr, label = out
                if use_native and arr.shape[:2] == (self.size, self.size):
                    imgs.append(arr.astype(np.float32))
                else:
                    rng = random.Random(
                        hash((self.seed, self.epoch, int(j))))
                    imgs.append(cell_augment(
                        arr, rng, self.size, self.mean, self.std,
                        training=self.training))
                labels.append(label)
            if not imgs:
                continue
            batch = np.stack(imgs).astype(np.float32)
            if use_native and batch.shape[1] == self.size:
                # C++ threaded flip/pad-crop/normalize pipeline
                batch = native.cell_augment_batch(
                    batch, seed=self.seed * 10007 + self.epoch * 101 + i,
                    training=self.training, mean=self.mean, std=self.std)
            yield {"image": batch,
                   "label": np.asarray(labels, np.int64)}
