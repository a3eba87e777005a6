"""Fused block kernel tests (interpret mode) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.ops.pallas.fused_block import (
    conv_pool,
    conv_pool_ref,
    merge_gate,
    merge_gate_ref,
)


def make_args(rows=4, cols=6, d=8, batch=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    L = rows * cols
    x = jax.random.normal(ks[0], (batch, L, d))
    z = jax.random.normal(ks[1], (batch, L, d))
    wf = jax.random.normal(ks[2], (4, d)) * 0.5
    bf = jax.random.normal(ks[3], (d,)) * 0.1
    wb = jax.random.normal(ks[4], (4, d)) * 0.5
    bb = jax.random.normal(ks[5], (d,)) * 0.1
    y_f = jax.random.normal(ks[6], (batch, rows, d))
    y_b = jax.random.normal(ks[7], (batch, rows, d))
    df = jax.random.normal(ks[8], (d,))
    db = jax.random.normal(ks[9], (d,))
    lnw = 1.0 + 0.1 * jax.random.normal(ks[10], (d,))
    lnb = 0.1 * jax.random.normal(ks[11], (d,))
    # merge_gate argument order
    return x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb


@pytest.mark.parametrize("method", ["mean", "max"])
def test_conv_pool_matches_ref(method):
    rows, cols, d = 4, 6, 8
    x, z, y_f, y_b, wf, bf, wb, bb, *_ = make_args(rows, cols, d)
    pf, pb = conv_pool(x, wf, bf, wb, bb, rows, cols, method, 1.0,
                       interpret=True)
    rf, rb = conv_pool_ref(x, wf, bf, wb, bb, rows, cols, method, 1.0)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(rf), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(rb), rtol=1e-4,
                               atol=1e-5)


def test_conv_pool_scaling():
    rows, cols, d = 2, 4, 8
    x, z, y_f, y_b, wf, bf, wb, bb, *_ = make_args(rows, cols, d)
    pf, _ = conv_pool(x, wf, bf, wb, bb, rows, cols, "mean", 0.25,
                      interpret=True)
    rf, _ = conv_pool_ref(x, wf, bf, wb, bb, rows, cols, "mean", 0.25)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(rf), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("use_norm", [True, False])
def test_merge_gate_matches_ref(use_norm):
    rows, cols, d = 4, 6, 8
    args = make_args(rows, cols, d)
    got = merge_gate(*args, rows, cols, 1e-5, use_norm, True)
    want = merge_gate_ref(*args, rows, cols, 1e-5, use_norm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_fused_grads_flow():
    rows, cols, d = 2, 4, 8
    args = make_args(rows, cols, d)

    def loss(x, wf, y_f):
        a = list(args)
        a[0], a[4], a[2] = x, wf, y_f
        pf, pb = conv_pool(a[0], a[4], a[5], a[6], a[7], rows, cols,
                           "mean", 1.0, True)
        m = merge_gate(*a, rows, cols, 1e-5, True, True)
        return jnp.sum(m**2) + jnp.sum(pf) + jnp.sum(pb)

    g = jax.grad(loss, argnums=(0, 1, 2))(args[0], args[4], args[2])
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
        assert float(jnp.abs(gi).max()) > 0


def test_multi_tile():
    """rows large enough to split into multiple tiles."""
    rows, cols, d = 16, 8, 128
    args = make_args(rows, cols, d, batch=1, seed=3)
    pf, pb = conv_pool(args[0], args[4], args[5], args[6], args[7],
                       rows, cols, "mean", 1.0, True)
    rf, rb = conv_pool_ref(args[0], args[4], args[5], args[6], args[7],
                           rows, cols, "mean", 1.0)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(rf), rtol=1e-4,
                               atol=1e-5)
    got = merge_gate(*args, rows, cols, 1e-5, True, True)
    want = merge_gate_ref(*args, rows, cols, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
