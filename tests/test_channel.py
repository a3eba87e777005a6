"""FastChannelVim tests: per-channel tokenization, scan orders, HCS
bucketing, 2dcompress schedule, numpy parity of the channel pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.models.channel import (
    ChannelVisionMamba,
    PatchEmbedPerChannel,
    hcs_sample,
)
from fastvim_tpu.ops.scan import broadcast_grid, pool_grid


def tiny_channel(**kw):
    cfg = dict(img_size=16, patch_size=8, depth=3, embed_dim=32,
               channels=5, num_classes=7, drop_path_rate=0.0,
               ssm_cfg=dict(d_state=4))
    cfg.update(kw)
    return ChannelVisionMamba(**cfg)


def test_patch_embed_per_channel_layouts():
    pe = PatchEmbedPerChannel(patch_size=8, in_chans=5, embed_dim=16,
                              scan_order="Channel-First")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = pe.init(jax.random.PRNGKey(1), x, jnp.arange(3))
    toks, grid = pe.apply(params, x, jnp.arange(3))
    assert grid == (2, 2, 3)
    assert toks.shape == (2, 12, 16)

    pe_s = PatchEmbedPerChannel(patch_size=8, in_chans=5, embed_dim=16,
                                scan_order="Spatial-First")
    params = pe_s.init(jax.random.PRNGKey(1), x, jnp.arange(3))
    toks_s, grid_s = pe_s.apply(params, x, jnp.arange(3))
    assert grid_s == (3, 2, 2)


def test_shared_filter_across_channels():
    """Same patch content in different channels differs only by the
    channel embedding (shared projection filter)."""
    pe = PatchEmbedPerChannel(patch_size=8, in_chans=4, embed_dim=16,
                              scan_order="Spatial-First")
    patch = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 1))
    x = jnp.tile(patch, (1, 1, 1, 2))  # identical content in 2 channels
    params = pe.init(jax.random.PRNGKey(1), x, jnp.arange(2))
    toks, grid = pe.apply(params, x, jnp.arange(2))
    # Spatial-First (C=2, 1, 1): token 0 = chan 0, token 1 = chan 1
    table = np.asarray(params["params"]["channel_embed"])
    diff = np.asarray(toks[0, 0] - toks[0, 1])
    np.testing.assert_allclose(diff, table[0] - table[1], rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("scan_order", ["Channel-First", "Spatial-First"])
def test_channel_forward(scan_order):
    model = tiny_channel(scan_order=scan_order)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(y)))


def test_hcs_subset_forward():
    """Same params work for any channel subset (bucketed static shapes)."""
    model = tiny_channel()
    x_full = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    params = model.init(jax.random.PRNGKey(1), x_full)
    chans = hcs_sample(0, 5)
    assert 1 <= len(chans) <= 5 and chans == sorted(chans)
    x_sub = x_full[..., jnp.asarray(chans)]
    y = model.apply(params, x_sub, channel_ids=jnp.asarray(chans))
    assert y.shape == (2, 7)


def test_2dcompress_forward():
    model = tiny_channel(compress_2d=True, depth=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 5))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == (1, 7)


def test_pool_grid_channel_first_matches_reference_reshape():
    """pool/broadcast over (rows, cols, C) grids == the reference's
    (B, d, rows, cols, C) mean(dim=3)+repeat_interleave (channels-last)."""
    B, rows, cols, C, d = 2, 3, 4, 5, 6
    x = np.random.default_rng(0).standard_normal((B, rows * cols * C, d))
    got = pool_grid(jnp.asarray(x), (rows, cols, C), (1,))
    want = x.reshape(B, rows, cols, C, d).mean(axis=2).reshape(B, -1, d)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    y = np.random.default_rng(1).standard_normal((B, rows * C, d))
    bc = broadcast_grid(jnp.asarray(y), (rows, cols, C), (1,))
    want_bc = np.repeat(y.reshape(B, rows, 1, C, d), cols,
                        axis=2).reshape(B, -1, d)
    np.testing.assert_allclose(np.asarray(bc), want_bc, rtol=1e-6, atol=1e-6)


def test_channel_remat_parity():
    """remat=True must be numerically identical (fwd + grads) to the
    plain block loop — it only trades recompute for memory."""
    model = tiny_channel()
    model_r = tiny_channel(remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    cid = jnp.arange(3)
    params = model.init(jax.random.PRNGKey(1), x, cid)

    def loss_fn(m, p):
        out = m.apply(p, x, channel_ids=cid)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    (l0, g0), (l1, g1) = (jax.value_and_grad(
        lambda p, m=m: loss_fn(m, p))(params) for m in (model, model_r))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_channel_flipfree_rotated_conv_parity(monkeypatch):
    """Channel-First odd layers run the rotated-raster conv flip-free
    (ops/conv.channel_grid_dual_conv1d) — must match the materialized
    rotate → conv → unrotate path exactly, fwd and grads."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    cid = jnp.arange(5)

    def run(flipfree):
        monkeypatch.setenv("FASTVIM_CHANNEL_FLIPFREE",
                           "1" if flipfree else "0")
        model = tiny_channel(depth=4)  # layers 1,3 rotated
        params = model.init(jax.random.PRNGKey(1), x, cid)

        def loss_fn(p):
            out = model.apply(p, x, channel_ids=cid)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    (l0, g0), (l1, g1) = run(False), run(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
