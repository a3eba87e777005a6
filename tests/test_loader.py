"""Host input-pipeline tests: multi-worker loader ordering/determinism,
error propagation, and the native (C++) RGB transform route.

The reference delegates all of this to torch DataLoader (12 worker
processes, imagenet_classification/config/FastVimT.yaml:2); here the
pool is in-tree and must be deterministic given (seed, epoch).
"""

import numpy as np
import pytest

from fastvim_tpu.data.loader import (
    DataLoader,
    SyntheticDataset,
    create_imagenet_loader,
    make_native_rgb_transform,
)


def _identity_transform(img, rng):
    return np.asarray(img, np.float32) / 255.0


def _collect(loader):
    return [(b["image"].copy(), b["label"].copy()) for b in loader]


def test_multiworker_matches_single_worker():
    ds = SyntheticDataset(40, 8, num_classes=7)
    mk = lambda nw: DataLoader(ds, batch_size=4, transform=_identity_transform,
                               shuffle=True, num_workers=nw, seed=3)
    a = _collect(mk(1))
    b = _collect(mk(4))
    assert len(a) == len(b) == 10
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_multiworker_epoch_reshuffles_and_is_deterministic():
    ds = SyntheticDataset(16, 8)
    dl = DataLoader(ds, batch_size=4, transform=_identity_transform,
                    shuffle=True, num_workers=3, seed=0)
    e1 = _collect(dl)
    e2 = _collect(dl)
    assert not all(np.array_equal(a[1], b[1]) for a, b in zip(e1, e2))
    dl2 = DataLoader(ds, batch_size=4, transform=_identity_transform,
                     shuffle=True, num_workers=2, seed=0)
    e1b = _collect(dl2)
    for (ia, la), (ib, lb) in zip(e1, e1b):
        np.testing.assert_array_equal(la, lb)


def test_worker_error_propagates():
    ds = SyntheticDataset(12, 8)

    def bad_transform(img, rng):
        raise RuntimeError("decode failed")

    dl = DataLoader(ds, batch_size=4, transform=bad_transform,
                    num_workers=3)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(dl)


def test_early_break_then_reiterate():
    ds = SyntheticDataset(24, 8)
    dl = DataLoader(ds, batch_size=4, transform=_identity_transform,
                    num_workers=2, seed=1)
    it = iter(dl)
    next(it)
    it.close()
    assert len(_collect(dl)) == 6


def test_native_rgb_transform_matches_python_stats():
    """The native MAE-recipe transform produces a correctly normalized
    (size, size, 3) float32 array; eval (training=False) is deterministic."""
    from fastvim_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    tf = make_native_rgb_transform(16, training=False)
    assert tf is not None
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (31, 45, 3), np.uint8))
    import random

    a = tf(img, random.Random(0))
    b = tf(img, random.Random(1))
    assert a.shape == (16, 16, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # eval path ignores rng
    # normalized range sanity: ImageNet stats put [0,1] into ~[-2.2, 2.7]
    assert a.min() > -3.0 and a.max() < 3.5


def test_create_loader_uses_native_for_mae_when_available():
    from fastvim_tpu import native

    loader = create_imagenet_loader(None, "train", 4, 16, training=True,
                                    mae=True, synthetic_samples=8,
                                    num_workers=2)
    batches = _collect(loader)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 16, 16, 3)
    if native.available():
        # route check: the configured transform is the native wrapper
        assert loader.transform.__qualname__.startswith(
            "make_native_rgb_transform")


def test_native_jpeg_loader_end_to_end(tmp_path):
    from PIL import Image

    from fastvim_tpu import native
    from fastvim_tpu.data.loader import (
        ImageFolderDataset,
        NativeJpegDataLoader,
    )

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 256, (64, 80, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=92)
    # one corrupt file exercises the per-image PIL fallback... make it a
    # real-but-odd file the PIL fallback can still open (PNG with .jpg ext)
    arr = rng.integers(0, 256, (64, 80, 3), np.uint8)
    Image.fromarray(arr).save(tmp_path / "a" / "weird.png")

    ds = ImageFolderDataset(str(tmp_path))
    loader = NativeJpegDataLoader(ds, batch_size=3, img_size=32,
                                  training=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (3, 32, 32, 3)
        assert b["image"].dtype == np.float32
        assert np.isfinite(b["image"]).all()
        assert b["label"].shape == (3,)
    # deterministic across loaders with the same seed/epoch
    loader2 = NativeJpegDataLoader(ds, batch_size=3, img_size=32,
                                   training=True, num_workers=1, seed=1)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(batches[0]["image"], b2["image"])
