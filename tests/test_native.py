"""Native C++ augment pipeline tests (build + parity with numpy)."""

import numpy as np
import pytest

from fastvim_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library failed to build")
    return True


def test_augment_eval_matches_numpy(lib_ok):
    """Eval path: center crop 0.875 + bilinear resize + normalize —
    deterministic, so compare structure against numpy expectations."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 64, 64, 3), np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = native.augment_batch(imgs, 32, seed=1, training=False,
                               mean=mean, std=std)
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    # normalization range sanity: pixel 0..1 → roughly (-mean/std, (1-mean)/std)
    assert out.min() >= ((0 - mean) / std).min() - 1e-4
    assert out.max() <= ((1 - mean) / std).max() + 1e-4
    # deterministic
    out2 = native.augment_batch(imgs, 32, seed=1, training=False,
                                mean=mean, std=std)
    np.testing.assert_array_equal(out, out2)


def test_augment_train_varies_with_seed(lib_ok):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    a = native.augment_batch(imgs, 32, seed=1, training=True,
                             mean=mean, std=std)
    b = native.augment_batch(imgs, 32, seed=2, training=True,
                             mean=mean, std=std)
    assert not np.allclose(a, b)


def test_cell_augment(lib_ok):
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 32, 32, 8)).astype(np.float32)
    mean = np.zeros(8, np.float32)
    std = np.ones(8, np.float32)
    out = native.cell_augment_batch(imgs, seed=3, training=True,
                                    mean=mean, std=std)
    assert out.shape == imgs.shape
    # eval path without augmentation is identity under zero-mean/unit-std
    out_eval = native.cell_augment_batch(imgs, seed=3, training=False,
                                         mean=mean, std=std)
    np.testing.assert_allclose(out_eval, imgs, rtol=1e-6, atol=1e-6)
