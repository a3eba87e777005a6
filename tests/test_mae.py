"""MAE (FastMaskVim) tests: masking invariants, shapes, loss behavior,
masked-mixer equivalence with the dense pooled mixer when nothing is
masked, and rotation consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.models.mae import (
    MaskedAutoencoderVim,
    get_2d_sincos_pos_embed,
    sorted_random_masking,
)
from fastvim_tpu.models.mixer import MambaMixer


def tiny_mae(**kw):
    cfg = dict(img_size=32, patch_size=8, depth=4, embed_dim=64,
               decoder_embed_dim=32, decoder_depth=2,
               ssm_cfg=dict(d_state=8))
    cfg.update(kw)
    return MaskedAutoencoderVim(**cfg)


def test_sincos_shape_and_range():
    pe = get_2d_sincos_pos_embed(64, 4)
    assert pe.shape == (16, 64)
    assert np.abs(pe).max() <= 1.0 + 1e-6


def test_sorted_random_masking_invariants():
    rng = jax.random.PRNGKey(0)
    ids_keep, mask, ids_restore = sorted_random_masking(rng, 4, 16, 4)
    ids_keep = np.asarray(ids_keep)
    mask = np.asarray(mask)
    ids_restore = np.asarray(ids_restore)
    # kept ids strictly ascending (scan order preserved)
    assert np.all(np.diff(ids_keep, axis=1) > 0)
    # mask has exactly L - len_keep ones
    assert np.all(mask.sum(1) == 12)
    # mask is 0 exactly at kept positions
    for b in range(4):
        assert set(np.where(mask[b] == 0)[0]) == set(ids_keep[b])
    # ids_restore is a permutation
    assert np.all(np.sort(ids_restore, axis=1) == np.arange(16))


def test_mae_forward_shapes():
    model = tiny_mae()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1),
                         "mask": jax.random.PRNGKey(2)}, x)
    loss, pred, mask = model.apply(params, x,
                                   rngs={"mask": jax.random.PRNGKey(3)})
    assert pred.shape == (2, 16, 8 * 8 * 3)
    assert mask.shape == (2, 16)
    assert np.isfinite(float(loss))


def test_mae_loss_decreases_wrt_perfect_pred():
    """Loss == 0 if pred equals the (normalized) target on masked patches."""
    model = tiny_mae(norm_pix_loss=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    bound = model.bind({"params": {}})
    target = bound.patchify(x)
    mask = jnp.ones((1, 16))
    loss = bound.loss(x, target, mask)
    assert float(loss) < 1e-10


def test_patchify_roundtrip():
    model = tiny_mae()
    bound = model.bind({"params": {}})
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    p = bound.patchify(x)
    back = bound.unpatchify(p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6,
                               atol=1e-6)


def test_masked_mixer_equals_dense_when_all_visible():
    """With mask_ratio=0 (all tokens kept, ids sorted), the masked mixer's
    constant-divide scatter-pool equals the dense mean-pool path."""
    rows, cols, d_model = 4, 4, 32
    L = rows * cols
    mixer = MambaMixer(d_model=d_model, d_state=8, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, L, d_model))
    params = mixer.init(jax.random.PRNGKey(1), x, (rows, cols))
    dense = mixer.apply(params, x, (rows, cols))
    ids_keep = jnp.broadcast_to(jnp.arange(L)[None], (2, L))
    row_onehot = jax.nn.one_hot(ids_keep // cols, rows)
    masked = mixer.apply(params, x, (rows, cols), row_onehot=row_onehot)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_mae_grads_finite():
    model = tiny_mae()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1),
                         "mask": jax.random.PRNGKey(2)}, x)

    def loss_fn(p):
        loss, _, _ = model.apply(p, x, rngs={"mask": jax.random.PRNGKey(3)})
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_mae_remat_parity():
    """remat=True (encoder + decoder blocks rematerialized) must be a
    pure memory/FLOPs tradeoff: identical loss and identical grads to
    the remat=False model with the same params and masking noise."""
    model = tiny_mae()
    model_r = tiny_mae(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1),
                         "mask": jax.random.PRNGKey(2)}, x)

    def loss_fn(m, p):
        loss, _, _ = m.apply(p, x, rngs={"mask": jax.random.PRNGKey(3)})
        return loss

    (l0, g0), (l1, g1) = (jax.value_and_grad(
        lambda p, m=m: loss_fn(m, p))(params) for m in (model, model_r))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
