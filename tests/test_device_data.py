"""Device-resident dataset pipeline (data/device.py): on-device RRC
augment correctness, exact padded eval, and one-program epochs."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.data.device import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_device_digits,
    make_device_augment,
    make_device_epoch_fn,
    make_device_eval_fn,
    resize_eval_batch,
)


def _denorm(x):
    return (np.asarray(x) * np.asarray(IMAGENET_STD)
            + np.asarray(IMAGENET_MEAN)) * 255.0


def test_augment_identity_box_is_plain_resize():
    """With scale=(1,1), ratio=(1,1), jitter=0 the crop box is the full
    image, so the augment must equal a plain bilinear resize — locks the
    scale/translate mapping (off-by-half-pixel bugs break this)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    aug = make_device_augment(32, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                              jitter=0.0)
    out = _denorm(aug(jnp.asarray(img), jax.random.PRNGKey(3)))
    want = np.asarray(jax.image.resize(
        jnp.asarray(img, jnp.float32), (32, 32, 3), method="linear"))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-2)


def test_augment_crop_box_samples_expected_coords():
    """White-box: recompute the sampled crop box from the same key
    stream, then check the resampled output of a coordinate-ramp image
    equals the affine prediction (bilinear resampling of a linear
    function is exact) on interior pixels."""
    S, H, W = 16, 8, 8
    ramp = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :, None],
                           (H, W, 3))
    img = jnp.asarray(ramp.astype(np.uint8))  # values 0..7 exact in u8
    scale, ratio = (0.5, 0.9), (0.8, 1.25)
    aug = make_device_augment(S, scale=scale, ratio=ratio, jitter=0.0)
    key = jax.random.PRNGKey(11)
    out = _denorm(aug(img, key))

    ka, kr, kx, ky, _, _, _ = jax.random.split(key, 7)
    area = float(jax.random.uniform(ka, (), minval=scale[0],
                                    maxval=scale[1])) * H * W
    logr = float(jax.random.uniform(kr, (), minval=np.log(ratio[0]),
                                    maxval=np.log(ratio[1])))
    w = np.clip(np.sqrt(area * np.exp(logr)), 1.0, W)
    h = np.clip(np.sqrt(area / np.exp(logr)), 1.0, H)
    x0 = float(jax.random.uniform(kx, (), maxval=1.0)) * (W - w)

    o = np.arange(S)
    sx = x0 + (o + 0.5) * (w / S) - 0.5     # input x sampled per column
    interior = (sx > 0.5) & (sx < W - 1.5)  # away from edge clamping
    np.testing.assert_allclose(out[S // 2, interior, 0], sx[interior],
                               rtol=2e-3, atol=2e-2)
    # rows are constant in a column ramp
    np.testing.assert_allclose(out[1:, :, 0], out[:-1, :, 0], atol=2e-2)


def test_device_eval_fn_padding_exact():
    """Chunked+padded device eval equals the direct unpadded computation
    (n not a multiple of batch)."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            return nn.Dense(5)(x.reshape((x.shape[0], -1)))

    model = Tiny()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(10, 4, 4, 3)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 5, (10,)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), xs[:1])

    eval_fn = make_device_eval_fn(model, xs, ys, batch_size=4)
    got = jax.tree_util.tree_map(float, eval_fn(params))

    logits = np.asarray(model.apply(params, xs), np.float64)
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                           .sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    y = np.asarray(ys)
    np.testing.assert_allclose(got["loss"],
                               -logp[np.arange(10), y].mean(), rtol=1e-5)
    np.testing.assert_allclose(got["acc"],
                               (logits.argmax(-1) == y).mean(), rtol=0,
                               atol=1e-6)


def test_device_epoch_fn_trains_and_counts_steps():
    """One-program epoch: runs, advances state.step by steps_per_epoch,
    loss falls on a learnable toy task (label = bright vs dark)."""
    from flax import linen as nn

    from fastvim_tpu.train import (
        TrainState,
        make_optimizer,
        make_supervised_train_step,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True, rngs=None):
            return nn.Dense(2)(x.reshape((x.shape[0], -1)))

    rng = np.random.default_rng(2)
    n = 24
    imgs = np.zeros((n, 8, 8, 3), np.uint8)
    imgs[: n // 2] = 220   # bright class 1
    imgs[n // 2:] = 30     # dark class 0
    labels = np.r_[np.ones(n // 2), np.zeros(n // 2)].astype(np.int32)

    model = Tiny()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))
    tx = make_optimizer(lambda i: 0.05, weight_decay=0.0, params=params)
    state = TrainState.create(params, tx)
    step = make_supervised_train_step(model, 2, label_smoothing=0.0,
                                      ema_decay=None)
    epoch_fn, spe = make_device_epoch_fn(
        step, jnp.asarray(imgs), jnp.asarray(labels), batch_size=8,
        augment=make_device_augment(16, jitter=0.1))
    assert spe == 3

    losses = []
    for e in range(4):
        state, means = epoch_fn(state, jax.random.PRNGKey(5), e)
        losses.append(float(means["train_loss"]))
    assert int(state.step) == 4 * spe
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_load_device_digits_shapes():
    tr_u8, tr_y, val_x, val_y, ncls = load_device_digits(16)
    assert ncls == 10
    assert tr_u8.shape[1:] == (8, 8, 3) and tr_u8.dtype == jnp.uint8
    assert val_x.shape[1:] == (16, 16, 3)
    assert tr_u8.shape[0] + val_x.shape[0] == 1797
    assert val_x.shape[0] == 300  # 30 per class
    # eval transform = resize+normalize of the raw u8 set
    back = _denorm(val_x[:2])
    assert back.min() > -1 and back.max() < 256


def test_resize_eval_batch_matches_reference_resize():
    rng = np.random.default_rng(3)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 8, 8, 3), np.uint8))
    got = _denorm(resize_eval_batch(u8, 32))
    want = np.asarray(jax.image.resize(
        u8.astype(jnp.float32), (2, 32, 32, 3), method="linear"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
