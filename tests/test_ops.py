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


def test_transposed_dual_conv_equals_rotate_conv_unrotate():
    """transposed_dual_conv1d == rotate → (anti)causal conv → unrotate,
    for rectangular grids (the odd-layer FastVim conv without the two
    full-HBM grid relayouts)."""
    import numpy as np

    from fastvim_tpu.models.blocks import rotate_grid
    from fastvim_tpu.ops.conv import (
        anticausal_conv1d,
        causal_conv1d,
        transposed_dual_conv1d,
    )

    rng = np.random.default_rng(0)
    for H, W in [(5, 7), (4, 4), (1, 6), (6, 1)]:
        d = 8
        x = jnp.asarray(rng.standard_normal((2, H * W, d)), jnp.float32)
        wc = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
        bc = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
        wa = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
        ba = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

        xt = rotate_grid(x, (H, W))
        ref_c = rotate_grid(causal_conv1d(xt, wc, bc), (W, H))
        ref_a = rotate_grid(anticausal_conv1d(xt, wa, ba), (W, H))
        got_c, got_a = transposed_dual_conv1d(x, wc, bc, wa, ba, (H, W))
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                                   rtol=1e-5, atol=1e-5)


def test_dual_conv_equals_separate_convs():
    import numpy as np

    from fastvim_tpu.ops.conv import (
        anticausal_conv1d,
        causal_conv1d,
        dual_conv1d,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 11, 8)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    bc = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    yc, ya = dual_conv1d(x, wc, bc, wa, None)
    np.testing.assert_allclose(np.asarray(yc),
                               np.asarray(causal_conv1d(x, wc, bc)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ya),
                               np.asarray(anticausal_conv1d(x, wa, None)),
                               rtol=1e-5, atol=1e-6)


def test_grid_dual_conv_axis1_equals_flat():
    """axis=1 (raster) grid conv == flat causal/anticausal conv over the
    flattened sequence, incl. cross-row wraparound."""
    import numpy as np

    from fastvim_tpu.ops.conv import (
        anticausal_conv1d,
        causal_conv1d,
        grid_dual_conv1d,
    )

    rng = np.random.default_rng(2)
    for H, W in [(5, 7), (3, 6), (6, 1), (1, 9)]:
        d = 8
        x = jnp.asarray(rng.standard_normal((2, H * W, d)), jnp.float32)
        wc = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
        bc = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
        wa = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
        got_c, got_a = grid_dual_conv1d(x, wc, bc, wa, None, (H, W),
                                        axis=1)
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(causal_conv1d(x, wc, bc)),
            rtol=1e-5, atol=1e-5, err_msg=f"causal {H}x{W}")
        np.testing.assert_allclose(
            np.asarray(got_a), np.asarray(anticausal_conv1d(x, wa, None)),
            rtol=1e-5, atol=1e-5, err_msg=f"anticausal {H}x{W}")


def test_channel_grid_dual_conv_equals_rotate_conv_unrotate():
    """channel_grid_dual_conv1d == rotate (swap rows/cols of the 3-D
    Channel-First grid) → (anti)causal conv → unrotate — the flip-free
    odd-layer ChannelVim conv, incl. the one-row and one-column wraps."""
    import numpy as np

    from fastvim_tpu.models.blocks import rotate_grid
    from fastvim_tpu.ops.conv import (
        anticausal_conv1d,
        causal_conv1d,
        channel_grid_dual_conv1d,
    )

    rng = np.random.default_rng(3)
    for H, W, C in [(3, 4, 5), (2, 2, 4), (5, 7, 6), (1, 6, 4), (6, 1, 4)]:
        d = 8
        x = jnp.asarray(rng.standard_normal((2, H * W * C, d)), jnp.float32)
        wc = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
        bc = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
        wa = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)

        xt = rotate_grid(x, (H, W, C))
        ref_c = rotate_grid(causal_conv1d(xt, wc, bc), (W, H, C))
        ref_a = rotate_grid(anticausal_conv1d(xt, wa, None), (W, H, C))
        got_c, got_a = channel_grid_dual_conv1d(x, wc, bc, wa, None,
                                                (H, W, C))
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(ref_c), rtol=1e-5, atol=1e-5,
            err_msg=f"causal {H}x{W}x{C}")
        np.testing.assert_allclose(
            np.asarray(got_a), np.asarray(ref_a), rtol=1e-5, atol=1e-5,
            err_msg=f"anticausal {H}x{W}x{C}")
