"""Host input-pipeline throughput (VERDICT r1 #5 bench note).

Measures images/sec of the DataLoader over synthetic JPEG-sized data for
{python, native-C++} transforms × worker counts. The reference uses 12
torch DataLoader worker processes (imagenet_classification/config/
FastVimT.yaml:2); this container exposes a single CPU core, so the
host-bound ceiling here is documented rather than the 5.5k img/s device
rate matched.

Run: python benchmarks/loader_bench.py [--n 256] [--img 224]
"""

import argparse
import json
import time

import numpy as np

from fastvim_tpu.data.loader import (
    DataLoader,
    SyntheticDataset,
    make_native_rgb_transform,
)
from fastvim_tpu.data import transforms as T


class RawJpegLikeDataset(SyntheticDataset):
    """Synthetic dataset that decodes a real JPEG per sample (so decode
    cost is included, like ImageFolder)."""

    def __init__(self, num_samples, size, src_size=500):
        super().__init__(num_samples, src_size)
        import io

        from PIL import Image

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (src_size, src_size, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=85)
        self._jpeg = buf.getvalue()

    def load(self, idx):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(self._jpeg))
        img.load()
        return img, idx % 1000


def measure(ds, tf, workers, batch=32):
    dl = DataLoader(ds, batch, transform=tf, shuffle=False,
                    num_workers=workers)
    n = 0
    t0 = time.perf_counter()
    for b in dl:
        n += b["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--img", type=int, default=224)
    args = ap.parse_args()
    import os

    ds = RawJpegLikeDataset(args.n, args.img)
    py_train = lambda img, rng: T.train_transform(img, args.img, rng)
    py_mae = lambda img, rng: T.mae_transform(img, args.img, rng)
    native = make_native_rgb_transform(args.img, True, (0.2, 1.0))

    out = {"cpu_count": os.cpu_count()}
    for name, tf in [("python_randaug", py_train),
                     ("python_mae", py_mae)] + (
                     [("native_mae", native)] if native else []):
        for w in (1, 4):
            out[f"{name}_w{w}_img_s"] = round(measure(ds, tf, w), 1)
            print(json.dumps({f"{name}_w{w}": out[f"{name}_w{w}_img_s"]}),
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
