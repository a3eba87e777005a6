"""Selective-scan parity tests.

Mirrors the reference kernel test strategy
(`mamba-1p1p1/tests/ops/test_selective_scan.py`: fwd+bwd vs
selective_scan_ref over a parameter grid) and the compressed-kernel tests
(`fastvim_kernel/mamba-1p1p1/tests/test_compressed_scan.py`: compression
factors {1,2,8}, pooled-scan semantics), with a numpy golden model as the
independent oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.ops import (
    broadcast_tokens,
    pool_tokens,
    selective_scan,
    selective_scan_assoc,
    selective_scan_ref,
)
from fastvim_tpu.ops.pallas.selective_scan import selective_scan_pallas


def numpy_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
               delta_softplus=False):
    """Independent numpy oracle, channels-last (batch, L, d)."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)[None, None]
    if delta_softplus:
        delta = np.logaddexp(0.0, delta)
    batch, L, d = u.shape
    n = A.shape[1]
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    h = np.zeros((batch, d, n))
    ys = np.zeros((batch, L, d))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])  # (batch, d, n)
        if B.ndim == 2:  # (d, n) constant
            dBu = delta[:, t, :, None] * B[None] * u[:, t, :, None]
        else:  # (batch, L, n) variable
            dBu = (delta[:, t, :, None] * B[:, t][:, None, :]
                   * u[:, t, :, None])
        h = dA * h + dBu
        if C.ndim == 2:
            ys[:, t] = np.einsum("bdn,dn->bd", h, C)
        else:
            ys[:, t] = np.einsum("bdn,bn->bd", h, C[:, t])
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)[None, None]
    if z is not None:
        zz = np.asarray(z, np.float64)
        ys = ys * (zz / (1 + np.exp(-zz)))
    return ys


def make_inputs(rng, batch, L, d, n, var_bc=True, dtype=jnp.float32):
    ks = jax.random.split(rng, 8)
    u = jax.random.normal(ks[0], (batch, L, d), dtype)
    delta = 0.5 * jax.random.normal(ks[1], (batch, L, d), dtype)
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.5)
    if var_bc:
        B = jax.random.normal(ks[3], (batch, L, n), dtype)
        C = jax.random.normal(ks[4], (batch, L, n), dtype)
    else:
        B = jax.random.normal(ks[3], (d, n))
        C = jax.random.normal(ks[4], (d, n))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (batch, L, d), dtype)
    bias = 0.1 * jax.random.normal(ks[7], (d,))
    return u, delta, A, B, C, D, z, bias


@pytest.mark.parametrize("L", [1, 4, 33, 128])
@pytest.mark.parametrize("var_bc", [True, False])
def test_ref_matches_numpy(L, var_bc):
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(0), 2, L, 8, 4, var_bc)
    got = selective_scan_ref(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                             delta_softplus=True)
    want = numpy_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                      delta_softplus=True)
    # fp32 scan vs fp64 oracle: tolerance grows with accumulation length
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("L", [1, 7, 64, 300])
@pytest.mark.parametrize("var_bc", [True, False])
def test_assoc_matches_ref(L, var_bc):
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(1), 2, L, 16, 8, var_bc)
    ref, ref_state = selective_scan_ref(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True,
        return_last_state=True)
    got, got_state = selective_scan_assoc(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True,
        return_last_state=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_state), np.asarray(ref_state),
                               rtol=1e-4, atol=1e-4)


def test_assoc_grads_match_ref():
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(2), 2, 24, 8, 4)

    def loss(fn, args):
        u, delta, A, B, C, D, bias = args
        y = fn(u, delta, A, B, C, D=D, delta_bias=bias, delta_softplus=True)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    args = (u, delta, A, B, C, D, bias)
    g_ref = jax.grad(lambda a: loss(selective_scan_ref, a))(args)
    g_assoc = jax.grad(lambda a: loss(selective_scan_assoc, a))(args)
    for gr, ga in zip(g_ref, g_assoc):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("L,block_l", [(16, 8), (64, 16), (300, 128)])
def test_pallas_matches_ref(L, block_l):
    d, n = 256, 16
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(3), 2, L, d, n)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, delta_bias=bias,
                             delta_softplus=True)
    got = selective_scan_pallas(u, delta, A, B, C, D=D, delta_bias=bias,
                                delta_softplus=True, block_l=block_l,
                                block_d=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_grads_match_ref():
    d, n = 128, 8
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(4), 1, 32, d, n)

    def run(fn):
        def loss(args):
            u, delta, A, B, C, D, bias = args
            y = fn(u, delta, A, B, C, D=D, delta_bias=bias,
                   delta_softplus=True)
            return jnp.sum(jnp.tanh(y))
        return jax.grad(loss)((u, delta, A, B, C, D, bias))

    g_ref = run(selective_scan_ref)
    g_pal = run(lambda *a, **k: selective_scan_pallas(
        *a, **k, block_l=8, block_d=128, interpret=True))
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("cols", [1, 2, 8])
@pytest.mark.parametrize("method", ["mean", "max"])
def test_pooled_scan_matches_compressed_ref(cols, method):
    """Pooled scan + broadcast + D·u == the compressed golden model
    (faster_mamba_ssm/ops/selective_scan_interface.py:162-252)."""
    rng = jax.random.PRNGKey(5)
    batch, rows, d, n = 2, 6, 8, 4
    L = rows * cols
    u, delta_c, A, B, C, D, z, bias = make_inputs(rng, batch, rows, d, n)
    x_full = jax.random.normal(jax.random.PRNGKey(6), (batch, L, d))
    x_c = pool_tokens(x_full, rows, cols, method)
    y_c = selective_scan_ref(x_c, delta_c, A, B, C, D=None, delta_bias=bias,
                             delta_softplus=True)
    y = broadcast_tokens(y_c, cols) + D[None, None] * x_full
    # manual check
    xg = np.asarray(x_full).reshape(batch, rows, cols, d)
    xc_np = xg.mean(2) if method == "mean" else xg.max(2)
    np.testing.assert_allclose(np.asarray(x_c), xc_np, rtol=1e-6, atol=1e-6)
    yc_np = numpy_scan(xc_np, delta_c, A, B, C, delta_bias=bias,
                       delta_softplus=True)
    y_np = (np.repeat(yc_np, cols, axis=1)
            + np.asarray(D)[None, None] * np.asarray(x_full))
    np.testing.assert_allclose(np.asarray(y), y_np, rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize("impl", ["ref", "assoc"])
def test_reverse_scan_equals_flip_scan_flip(impl):
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(8), 2, 21, 8, 4)
    y_rev = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                           delta_softplus=True, impl=impl, reverse=True)
    y_flip = selective_scan(
        u[:, ::-1], delta[:, ::-1], A, B[:, ::-1], C[:, ::-1], D=D,
        delta_bias=bias, delta_softplus=True, impl=impl)[:, ::-1]
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_flip),
                               rtol=1e-4, atol=1e-5)


def test_pallas_reverse_wrap():
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(9), 1, 32, 128, 8)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, delta_bias=bias,
                             delta_softplus=True, reverse=True)
    got = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                         delta_softplus=True, impl="pallas", reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_anticausal_conv_equals_flip_conv_flip():
    from fastvim_tpu.ops.conv import anticausal_conv1d, causal_conv1d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(6), jnp.float32)
    got = anticausal_conv1d(x, w, b)
    want = causal_conv1d(x[:, ::-1], w, b)[:, ::-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dispatch():
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(7), 1, 16, 8, 4)
    a = selective_scan(u, delta, A, B, C, D=D, impl="ref")
    b = selective_scan(u, delta, A, B, C, D=D, impl="assoc")
    c = selective_scan(u, delta, A, B, C, D=D, impl="auto")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4,
                               atol=1e-4)


def test_pallas_lanes_variant_matches_ref():
    d, n = 256, 16
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(11), 2, 300, d, n)
    ref = selective_scan_ref(u, delta, A, B, C, D=D, delta_bias=bias,
                             delta_softplus=True)
    got = selective_scan_pallas(u, delta, A, B, C, D=D, delta_bias=bias,
                                delta_softplus=True, block_l=128,
                                block_d=128, interpret=True,
                                variant="lanes")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("L,block_l,reverse", [
    (32, 8, False),    # multi-chunk
    (30, 8, False),    # multi-chunk + pad
    (32, 8, True),     # reverse multi-chunk
    (30, 8, True),     # reverse + pad
])
def test_pallas_fused_backward_matches_ref(L, block_l, reverse):
    """The fused chunk-recompute Pallas backward
    (selective_scan_bwd_kernel.cuh structure: saved per-chunk entry
    states + adjoint λ scan with carried state) matches the sequential
    reference's autodiff, both directions, padded and exact chunks."""
    d, n = 128, 8
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(10), 2, L, d, n)

    def run(fn):
        def loss(args):
            u, delta, A, B, C, D, bias = args
            y = fn(u, delta, A, B, C, D=D, delta_bias=bias,
                   delta_softplus=True, reverse=reverse)
            return jnp.sum(jnp.tanh(y))
        return jax.grad(loss)((u, delta, A, B, C, D, bias))

    g_ref = run(selective_scan_ref)
    g_pal = run(lambda *a, **k: selective_scan_pallas(
        *a, **k, block_l=block_l, block_d=128, interpret=True))
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_pallas_fused_backward_no_optional_args():
    """D=None / delta_bias=None paths return None grads."""
    d, n = 128, 8
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(11), 1, 16, d, n)

    def loss(args):
        u, delta, A, B, C = args
        y = selective_scan_pallas(u, delta, A, B, C, block_l=8,
                                  block_d=128, interpret=True)
        return jnp.sum(jnp.abs(y))

    g = jax.grad(loss)((u, delta, A, B, C))
    gr = jax.grad(lambda a: jnp.sum(jnp.abs(selective_scan_ref(
        a[0], a[1], a[2], a[3], a[4]))))((u, delta, A, B, C))
    for gp, grr in zip(g, gr):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(grr),
                                   rtol=2e-3, atol=2e-3)


def test_pallas_native_reverse_no_flips():
    """Kernel-native reverse: jaxpr of the pallas dispatch contains no
    full-length rev ops (the old flip-wrap materialized 4)."""
    u, delta, A, B, C, D, z, bias = make_inputs(
        jax.random.PRNGKey(12), 1, 32, 128, 8)
    jaxpr = jax.make_jaxpr(
        lambda *a: selective_scan(a[0], a[1], a[2], a[3], a[4],
                                  impl="pallas", reverse=True))(
        u, delta, A, B, C)
    assert "rev" not in str(jaxpr)


# ---------------------------------------------------------------------------
# Complex-A path (reference test_selective_scan.py wtype=complex64)
# ---------------------------------------------------------------------------

def numpy_scan_complex(u, delta, A, B, C, D=None, z=None,
                       delta_bias=None, delta_softplus=False):
    """Independent complex oracle: the recurrence over C^n with
    y = 2*Re(<C, h>) (selective_scan_ref, selective_scan_interface.py:
    190-199). B/C complex (batch, L, n) or (d, n)."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)[None, None]
    if delta_softplus:
        delta = np.logaddexp(0.0, delta)
    batch, L, d = u.shape
    n = A.shape[1]
    A = np.asarray(A, np.complex128)
    B = np.asarray(B, np.complex128)
    C = np.asarray(C, np.complex128)
    h = np.zeros((batch, d, n), np.complex128)
    ys = np.zeros((batch, L, d))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])
        if B.ndim == 2:
            dBu = delta[:, t, :, None] * B[None] * u[:, t, :, None]
        else:
            dBu = (delta[:, t, :, None] * B[:, t][:, None, :]
                   * u[:, t, :, None])
        h = dA * h + dBu
        if C.ndim == 2:
            y = np.einsum("bdn,dn->bd", h, C)
        else:
            y = np.einsum("bdn,bn->bd", h, C[:, t])
        ys[:, t] = 2.0 * y.real
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)[None, None]
    if z is not None:
        zz = np.asarray(z, np.float64)
        ys = ys * (zz / (1 + np.exp(-zz)))
    return ys, h


def make_complex_inputs(rng, batch, L, d, n, var_bc=True):
    ks = jax.random.split(rng, 9)
    u = jax.random.normal(ks[0], (batch, L, d))
    delta = 0.5 * jax.random.normal(ks[1], (batch, L, d))
    # stable complex A: negative real part, bounded imaginary part
    A = (-jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.5)
         + 1j * jax.random.normal(ks[8], (d, n)))
    if var_bc:
        B = (jax.random.normal(ks[3], (batch, L, n))
             + 1j * jax.random.normal(ks[5], (batch, L, n)))
        C = (jax.random.normal(ks[4], (batch, L, n))
             + 1j * jax.random.normal(ks[6], (batch, L, n)))
    else:
        B = (jax.random.normal(ks[3], (d, n))
             + 1j * jax.random.normal(ks[5], (d, n)))
        C = (jax.random.normal(ks[4], (d, n))
             + 1j * jax.random.normal(ks[6], (d, n)))
    D = jax.random.normal(ks[7], (d,))
    z = jax.random.normal(ks[5], (batch, L, d))
    bias = 0.1 * jax.random.normal(ks[6], (d,))
    return u, delta, A, B, C, D, z, bias


@pytest.mark.parametrize("impl", ["ref", "assoc", "auto"])
@pytest.mark.parametrize("var_bc", [True, False])
def test_complex_scan_matches_numpy(impl, var_bc):
    u, delta, A, B, C, D, z, bias = make_complex_inputs(
        jax.random.PRNGKey(0), 2, 17, 6, 4, var_bc)
    out, last = selective_scan(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias,
        delta_softplus=True, return_last_state=True, impl=impl)
    want, h_want = numpy_scan_complex(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                               atol=2e-4)
    assert out.dtype == u.dtype and not jnp.iscomplexobj(out)
    assert last.dtype == jnp.complex64 and last.shape == (2, 6, 4)
    np.testing.assert_allclose(np.asarray(last), h_want, rtol=2e-4,
                               atol=2e-4)


def test_complex_scan_torch_interleaved_bc_convention():
    """Real B/C with time dim 2L (the torch view_as_complex layout,
    selective_scan_interface.py:161-168) equal the complex-array form."""
    u, delta, A, B, C, D, z, bias = make_complex_inputs(
        jax.random.PRNGKey(1), 2, 9, 5, 3, var_bc=True)
    b2 = jnp.stack([jnp.real(B), jnp.imag(B)], 2).reshape(2, 18, 3)
    c2 = jnp.stack([jnp.real(C), jnp.imag(C)], 2).reshape(2, 18, 3)
    out_c = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                           delta_softplus=True)
    out_r = selective_scan(u, delta, A, b2, c2, D=D, z=z,
                           delta_bias=bias, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["ref", "assoc"])
def test_complex_reverse_equals_flip_scan_flip(impl):
    u, delta, A, B, C, D, z, bias = make_complex_inputs(
        jax.random.PRNGKey(2), 2, 13, 4, 3, var_bc=True)
    rev = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                         delta_softplus=True, reverse=True, impl=impl)
    flip = selective_scan(u[:, ::-1], delta[:, ::-1], A, B[:, ::-1],
                          C[:, ::-1], D=D, z=z[:, ::-1],
                          delta_bias=bias, delta_softplus=True,
                          impl=impl)[:, ::-1]
    np.testing.assert_allclose(np.asarray(rev), np.asarray(flip),
                               rtol=2e-4, atol=2e-4)


def test_complex_scan_grads_finite_and_match_impls():
    u, delta, A, B, C, D, z, bias = make_complex_inputs(
        jax.random.PRNGKey(3), 1, 11, 4, 3, var_bc=True)

    def loss(impl):
        def f(args):
            u_, d_ = args
            out = selective_scan(u_, d_, A, B, C, D=D, z=z,
                                 delta_bias=bias, delta_softplus=True,
                                 impl=impl)
            return jnp.sum(out ** 2)

        return jax.grad(f)((u, delta))

    gu_r, gd_r = loss("ref")
    gu_a, gd_a = loss("assoc")
    for g in (gu_r, gd_r, gu_a, gd_a):
        assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(gu_r), np.asarray(gu_a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd_r), np.asarray(gd_a),
                               rtol=1e-4, atol=1e-4)


def test_complex_scan_rejects_pallas():
    u, delta, A, B, C, D, z, bias = make_complex_inputs(
        jax.random.PRNGKey(4), 1, 8, 4, 3)
    with pytest.raises(ValueError, match="no Pallas"):
        selective_scan(u, delta, A, B, C, impl="pallas")
