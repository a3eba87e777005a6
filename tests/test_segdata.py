"""ADE20K data pipeline + mIoU eval-loop tests (the reference delegates
to mmseg: configs/_base_/datasets/ade20k.py, slide test mode :42-76)."""

import os
import random

import numpy as np
import pytest

from fastvim_tpu.data.segmentation import (
    ADE20KDataset,
    IGNORE,
    SegmentationLoader,
    SyntheticSegDataset,
    create_segmentation_loader,
    seg_eval_transform,
    seg_train_transform,
)


def _write_fake_ade20k(root, n=3, size=37):
    from PIL import Image

    for split in ("training", "validation"):
        os.makedirs(os.path.join(root, "images", split))
        os.makedirs(os.path.join(root, "annotations", split))
        for i in range(n):
            rng = np.random.default_rng(i)
            img = rng.integers(0, 256, (size, size + 5, 3), np.uint8)
            ann = rng.integers(0, 5, (size, size + 5)).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "images", split, f"im_{i}.jpg"))
            Image.fromarray(ann).save(
                os.path.join(root, "annotations", split, f"im_{i}.png"))


def test_ade20k_reduce_zero_label(tmp_path):
    _write_fake_ade20k(str(tmp_path))
    ds = ADE20KDataset(str(tmp_path), "training")
    assert len(ds) == 3
    img, lbl = ds.load(0)
    assert img.dtype == np.uint8
    # raw 0 → IGNORE, raw k → k-1
    assert set(np.unique(lbl)) <= {0, 1, 2, 3, IGNORE}


def test_seg_train_transform_contract():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (100, 140, 3), np.uint8)
    lbl = rng.integers(0, 10, (100, 140)).astype(np.int32)
    im, lb = seg_train_transform(img, lbl, random.Random(0), crop=64)
    assert im.shape == (64, 64, 3) and lb.shape == (64, 64)
    assert im.dtype == np.float32 and lb.dtype == np.int32
    assert lb.max() < 10 or IGNORE in np.unique(lb)


def test_seg_eval_transform_keep_ratio():
    img = np.zeros((100, 200, 3), np.uint8)
    lbl = np.zeros((100, 200), np.int32)
    im, lb = seg_eval_transform(img, lbl, short_side=50)
    assert min(im.shape[:2]) == 50
    assert abs(im.shape[1] / im.shape[0] - 2.0) < 0.05


def test_segmentation_loader_folder(tmp_path):
    _write_fake_ade20k(str(tmp_path), size=70)
    dl = create_segmentation_loader(str(tmp_path), "training", 2, 64,
                                    training=True, num_classes=5,
                                    num_workers=2)
    b = next(iter(dl))
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["label"].shape == (2, 64, 64)
    # eval loader pads to a 32-multiple canvas, ignore-padded labels
    dl_e = create_segmentation_loader(str(tmp_path), "validation", 1, 64,
                                      training=False, num_classes=5)
    be = next(iter(dl_e))
    assert be["image"].shape[1] % 32 == 0
    assert (be["label"] == IGNORE).any()


def test_evaluate_miou_perfect_predictor():
    """A predictor that returns one-hot GT logits scores mIoU 1.0 through
    the slide-inference eval loop."""
    import jax.numpy as jnp

    from fastvim_tpu.cli.train_segmentation import evaluate_miou

    class FakeSeg:
        def apply(self, params, images, deterministic=True):
            # labels are encoded in the image's first channel
            lbl = images[..., 0].astype(jnp.int32)
            return jnp.eye(4, dtype=jnp.float32)[lbl]

    ds = SyntheticSegDataset(2, 48, num_classes=4)

    class LblLoader:
        def __iter__(self):
            for i in range(2):
                _, lbl = ds.load(i)
                img = np.repeat(lbl[..., None], 3, -1).astype(np.float32)
                yield {"image": img[None], "label": lbl[None]}

    miou = evaluate_miou(FakeSeg(), None, LblLoader(), 4, crop=32)
    assert miou == pytest.approx(1.0)


def test_eval_loader_batches_variable_aspect_images(tmp_path):
    """eval_batch_size > 1 with variable-aspect images: the batch pads to
    ONE common canvas (code-review r2 finding)."""
    from PIL import Image

    root = str(tmp_path)
    for split in ("validation",):
        os.makedirs(os.path.join(root, "images", split))
        os.makedirs(os.path.join(root, "annotations", split))
        for i, (h, w) in enumerate([(60, 80), (60, 60), (80, 50)]):
            rng = np.random.default_rng(i)
            Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)
                            ).save(os.path.join(root, "images", split,
                                                f"im_{i}.jpg"))
            Image.fromarray(rng.integers(0, 5, (h, w)).astype(np.uint8)
                            ).save(os.path.join(root, "annotations",
                                                split, f"im_{i}.png"))
    dl = SegmentationLoader(ADE20KDataset(root, "validation"),
                            batch_size=3, crop=32, training=False,
                            shuffle=False, drop_last=False)
    b = next(iter(dl))
    assert b["image"].shape[0] == 3
    assert b["image"].shape[1] == b["image"].shape[2]
    assert b["image"].shape[1] % 32 == 0
