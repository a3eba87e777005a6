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


def _save_jpeg(path, arr, quality=95):
    from PIL import Image

    Image.fromarray(arr).save(path, "JPEG", quality=quality)


def test_jpeg_dims(lib_ok, tmp_path):
    arr = np.full((48, 64, 3), 128, np.uint8)
    p = tmp_path / "a.jpg"
    _save_jpeg(p, arr)
    assert native.jpeg_dims(p.read_bytes()) == (48, 64)
    assert native.jpeg_dims(b"not a jpeg") is None


def test_decode_augment_batch_solid_color(lib_ok, tmp_path):
    """Solid-color JPEGs decode ~exactly; eval crop+resize of a constant
    image is the constant — locks the fused decode+normalize math."""
    colors = [(200, 30, 90), (10, 220, 140)]
    jpegs = []
    for i, c in enumerate(colors):
        arr = np.zeros((80, 96, 3), np.uint8)
        arr[:] = c
        p = tmp_path / f"{i}.jpg"
        _save_jpeg(p, arr, quality=100)
        jpegs.append(p.read_bytes())
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out, fail = native.decode_augment_batch(jpegs, 32, seed=1,
                                            training=False,
                                            mean=mean, std=std)
    assert out.shape == (2, 32, 32, 3) and not fail.any()
    for i, c in enumerate(colors):
        want = (np.asarray(c, np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(out[i], np.broadcast_to(want, (32, 32, 3)),
                                   atol=0.06)


def test_decode_augment_batch_failure_flag(lib_ok):
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out, fail = native.decode_augment_batch([b"corrupt!"], 16, seed=0,
                                            training=True, mean=mean,
                                            std=std)
    assert fail.tolist() == [1]
    assert (out == 0).all()


def test_decode_augment_dct_scaling_matches_fullsize(lib_ok, tmp_path):
    """A large gradient JPEG decoded through DCT scaling should land close
    to the PIL full-decode + same crop math (different resample kernels —
    compare loosely)."""
    from PIL import Image

    y = np.linspace(0, 255, 512, dtype=np.float32)
    arr = np.broadcast_to(y[:, None, None], (512, 512, 3)).astype(np.uint8)
    p = tmp_path / "g.jpg"
    _save_jpeg(p, np.ascontiguousarray(arr), quality=98)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out, fail = native.decode_augment_batch([p.read_bytes()], 64, seed=0,
                                            training=False, mean=mean,
                                            std=std)
    assert not fail.any()
    with Image.open(p) as img:
        full = np.asarray(img.convert("RGB"), np.uint8)[None]
    ref = native.augment_batch(full, 64, seed=0, training=False,
                               mean=mean, std=std)
    assert np.abs(out - ref).mean() < 0.02
