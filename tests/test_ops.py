"""Conv / norm / state-update op tests vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.ops import (
    add_norm,
    causal_conv1d,
    causal_conv1d_update,
    layer_norm,
    rms_norm,
    selective_state_update,
)


def np_silu(x):
    return x / (1 + np.exp(-x))


@pytest.mark.parametrize("width", [2, 3, 4])
def test_causal_conv1d(width):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 11, 6)).astype(np.float32)
    w = rng.standard_normal((width, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    got = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    xp = np.pad(x, ((0, 0), (width - 1, 0), (0, 0)))
    want = np.zeros_like(x)
    for t in range(x.shape[1]):
        want[:, t] = (xp[:, t : t + width] * w[None]).sum(1) + b
    want = np_silu(want)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_conv_update_matches_full():
    """Incremental conv over a stream equals the full causal conv."""
    rng = np.random.default_rng(1)
    width, d, L = 4, 6, 9
    x = jnp.asarray(rng.standard_normal((2, L, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((width, d)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(d), jnp.float32)
    full = causal_conv1d(x, w, b)
    state = jnp.zeros((2, width, d))
    outs = []
    for t in range(L):
        y, state = causal_conv1d_update(x[:, t], state, w, b)
        outs.append(y)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_layer_norm_and_rms_norm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    got_ln = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want_ln = (x - mu) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(np.asarray(got_ln), want_ln, rtol=1e-4,
                               atol=1e-4)
    got_rms = rms_norm(jnp.asarray(x), jnp.asarray(w))
    want_rms = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(np.asarray(got_rms), want_rms, rtol=1e-4,
                               atol=1e-4)


def test_add_norm_prenorm_residual():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    w = jnp.ones(8)
    y, new_res = add_norm(x, w, residual=res, prenorm=True, rms=True)
    assert new_res.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(new_res),
        np.asarray(x.astype(jnp.float32) + res), rtol=1e-6, atol=1e-6)
    assert y.dtype == jnp.bfloat16


def test_selective_state_update_matches_scan_step():
    """One state-update step == one step of the sequential scan."""
    from fastvim_tpu.ops import selective_scan_ref

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 7)
    batch, d, n, L = 2, 8, 4, 5
    u = jax.random.normal(ks[0], (batch, L, d))
    delta = jax.random.normal(ks[1], (batch, L, d)) * 0.3
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (batch, L, n))
    C = jax.random.normal(ks[4], (batch, L, n))
    D = jax.random.normal(ks[5], (d,))
    bias = 0.1 * jax.random.normal(ks[6], (d,))

    full, last = selective_scan_ref(u, delta, A, B, C, D=D, delta_bias=bias,
                                    delta_softplus=True,
                                    return_last_state=True)
    state = jnp.zeros((batch, d, n))
    for t in range(L):
        y, state = selective_state_update(
            state, u[:, t], delta[:, t], A, B[:, t], C[:, t], D=D,
            dt_bias=bias, dt_softplus=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, -1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state), np.asarray(last),
                               rtol=1e-4, atol=1e-4)
