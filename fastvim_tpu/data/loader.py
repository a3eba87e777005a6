"""Host data loading: folder datasets, threaded prefetch, synthetic data.

Replaces the reference's torch DataLoader stack
(`imagenet_classification/datasets_supervised.py`, `mae/datasets_mae.py`):
an ImageFolder-style dataset decoded with PIL, a thread-pool prefetching
loader producing NHWC numpy batches (double-buffered so host decode
overlaps device compute), and a synthetic dataset for smoke tests/benches
(the reference's commented FakeData path,
datasets_supervised.py:64-67).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageFolderDataset:
    """<root>/<class_name>/<image> layout, classes sorted alphabetically."""

    def __init__(self, root: str):
        self.root = root
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append(
                        (os.path.join(cdir, fname), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int):
        from PIL import Image

        path, label = self.samples[idx]
        with Image.open(path) as img:
            return img.convert("RGB"), label


class SyntheticDataset:
    """Deterministic fake images for smoke tests and benchmarks."""

    def __init__(self, num_samples: int, size: int, channels: int = 3,
                 num_classes: int = 1000):
        self.num_samples = num_samples
        self.size = size
        self.channels = channels
        self.num_classes = num_classes

    def __len__(self):
        return self.num_samples

    def load(self, idx: int):
        from PIL import Image

        rng = np.random.default_rng(idx)
        arr = rng.integers(0, 256, (self.size, self.size, self.channels),
                           dtype=np.uint8)
        img = Image.fromarray(arr[..., :3] if self.channels >= 3 else
                              np.repeat(arr, 3, axis=-1))
        return img, idx % self.num_classes


class DataLoader:
    """Threaded prefetching loader → NHWC float32 numpy batches."""

    def __init__(self, dataset, batch_size: int,
                 transform: Callable, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _batches(self) -> Iterator[List[int]]:
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idxs)
        for i in range(0, len(idxs), self.batch_size):
            chunk = idxs[i : i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield list(chunk)

    def __iter__(self):
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batches = list(self._batches())
        self.epoch += 1
        epoch = self.epoch

        def worker():
            try:
                for bi, batch_idx in enumerate(batches):
                    imgs, labels = [], []
                    for j in batch_idx:
                        img, label = self.dataset.load(int(j))
                        rng = random.Random(
                            hash((self.seed, epoch, int(j))))
                        imgs.append(self.transform(img, rng))
                        labels.append(label)
                    out_q.put((np.stack(imgs).astype(np.float32),
                               np.asarray(labels, np.int64)))
                out_q.put(None)
            except BaseException as e:  # propagate to the consumer
                out_q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield {"image": item[0], "label": item[1]}


def create_imagenet_loader(
    data_dir: Optional[str], split: str, batch_size: int, img_size: int,
    training: bool, mae: bool = False, num_workers: int = 4, seed: int = 0,
    synthetic_samples: int = 512,
):
    """Folder loader if data_dir exists, else synthetic (FakeData path)."""
    from fastvim_tpu.data import transforms as T

    if training:
        if mae:
            tf = lambda img, rng: T.mae_transform(img, img_size, rng)
        else:
            tf = lambda img, rng: T.train_transform(img, img_size, rng)
    else:
        tf = lambda img, rng: T.eval_transform(img, img_size)

    if data_dir and os.path.isdir(os.path.join(data_dir, split)):
        ds = ImageFolderDataset(os.path.join(data_dir, split))
    else:
        ds = SyntheticDataset(synthetic_samples, img_size)
    return DataLoader(ds, batch_size, tf, shuffle=training,
                      num_workers=num_workers, seed=seed)
