"""Selective-scan (Mamba SSM) ops, TPU-native.

The selective scan computes, per (batch, channel) pair, the linear recurrence

    h[t] = exp(delta[t] * A) * h[t-1] + delta[t] * B[t] * u[t]
    y[t] = <C[t], h[t]> (+ D * u[t]) (* silu(z[t]))

Semantics match the reference golden model
(`mamba-1p1p1/mamba_ssm/ops/selective_scan_interface.py:126-206`,
`selective_scan_ref`) but the layout here is channels-last ``(batch, L, d)``
— the natural TPU layout (feature dim on lanes) — instead of torch's
``(batch, d, L)``.

Three implementations:

* ``impl="ref"``    — sequential ``lax.scan`` oracle (the spec).
* ``impl="assoc"``  — ``lax.associative_scan`` log-depth scan; pure XLA,
  fuses well, works on every backend. Default for short/pooled sequences.
* ``impl="pallas"`` — chunked Pallas TPU kernel for long sequences
  (see :mod:`fastvim_tpu.ops.pallas.selective_scan`).

All scan math is fp32 regardless of input dtype (mirrors the reference
kernels, which upcast to float for the recurrence); output is cast back to
the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _expand_bc(mat: Array, batch: int, L: int, d: int, n: int) -> Array:
    """Broadcast B/C to the (batch, L, n, d)-compatible layout.

    Supported layouts (mirroring `selective_scan_ref` docstring,
    selective_scan_interface.py:139-146):
      (d, n)           constant over batch/time
      (batch, L, n)    input-dependent (the Mamba/FastVim case)
      (batch, L, g, n) grouped input-dependent; groups broadcast over d//g

    NOTE the internal scan layout is (batch, L, n, d): the model dim d
    (192…2560) rides the TPU lane dimension; putting the tiny state dim
    n=16 last would force 16→128 lane padding and ~8× wasted HBM traffic
    on every scan intermediate.
    """
    if mat.ndim == 2:  # (d, n) → (1, 1, n, d)
        return mat.T[None, None].astype(jnp.float32)
    if mat.ndim == 3:  # (batch, L, n) → (batch, L, n, 1)
        return mat[:, :, :, None].astype(jnp.float32)
    if mat.ndim == 4:  # (batch, L, g, n) → (batch, L, n, d)
        g = mat.shape[2]
        rep = d // g
        mat = jnp.repeat(mat, rep, axis=2)  # (batch, L, d, n)
        return jnp.swapaxes(mat, 2, 3).astype(jnp.float32)
    raise ValueError(f"unsupported B/C shape {mat.shape}")


def _prepare(u, delta, A, B, C, delta_bias, delta_softplus):
    """Common fp32 preparation: biased/softplused delta, scan elements
    a, b in (batch, L, n, d) layout (see _expand_bc note)."""
    batch, L, d = u.shape
    n = A.shape[1]
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    At = A.T.astype(jnp.float32)  # (n, d)
    # a[t] = exp(delta[t] ⊗ A): (batch, L, n, d)
    a = jnp.exp(delta[:, :, None, :] * At[None, None])
    Bx = _expand_bc(B, batch, L, d, n)
    b = delta[:, :, None, :] * Bx * u[:, :, None, :]  # (batch, L, n, d)
    Cx = _expand_bc(C, batch, L, d, n)
    return u, a, b, Cx


def _split_complex_bc(mat: Array, L: int):
    """B/C for the complex-A path → (real, imag) in the standard real
    layouts `_expand_bc` accepts.

    Accepted forms (mirroring `selective_scan_ref`'s complex handling,
    selective_scan_interface.py:161-168):
      complex (d, n) / (batch, L, n) / (batch, L, g, n)   — JAX-native
      real    (batch, 2L, n) / (batch, 2L, g, n)          — the torch
        ``view_as_complex`` convention: time-interleaved (re, im) pairs
    """
    if jnp.iscomplexobj(mat):
        return jnp.real(mat), jnp.imag(mat)
    if mat.ndim >= 3 and mat.shape[1] == 2 * L:
        pairs = mat.reshape(mat.shape[0], L, 2, *mat.shape[2:])
        return pairs[:, :, 0], pairs[:, :, 1]
    # real-valued B/C with a complex A: imaginary part is zero
    return mat, jnp.zeros_like(mat)


def _prepare_complex(u, delta, A, B, C, delta_bias, delta_softplus):
    """Complex-A preparation in REAL-PAIR arithmetic (TPU-native: XLA's
    complex support on TPU is emulated pairwise anyway; doing it
    explicitly keeps every array a plain fp32 tensor in the (batch, L,
    n, d) scan layout).

    a[t] = exp(delta·(Ar + i·Ai)) = exp(delta·Ar)·(cos(delta·Ai) +
    i·sin(delta·Ai)).
    """
    batch, L, d = u.shape
    n = A.shape[1]
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    Ar = jnp.real(A).T.astype(jnp.float32)  # (n, d)
    Ai = jnp.imag(A).T.astype(jnp.float32)
    mag = jnp.exp(delta[:, :, None, :] * Ar[None, None])
    ang = delta[:, :, None, :] * Ai[None, None]
    aR, aI = mag * jnp.cos(ang), mag * jnp.sin(ang)
    BR, BI = _split_complex_bc(B, L)
    BxR = _expand_bc(BR, batch, L, d, n)
    BxI = _expand_bc(BI, batch, L, d, n)
    du = delta[:, :, None, :] * u[:, :, None, :]
    bR, bI = du * BxR, du * BxI
    CR, CI = _split_complex_bc(C, L)
    CxR = _expand_bc(CR, batch, L, d, n)
    CxI = _expand_bc(CI, batch, L, d, n)
    return u, (aR, aI), (bR, bI), (CxR, CxI)


def _assoc_combine_complex(left, right):
    """(a, b) linear-recurrence combine over ℂ in real pairs:
    a ← a2·a1, b ← a2·b1 + b2 (same 2×2 algebra as `_assoc_combine`,
    lifted to complex — the N4 SSMScanOp complex float4 combine,
    selective_scan_common.h)."""
    a1R, a1I, b1R, b1I = left
    a2R, a2I, b2R, b2I = right
    return (a2R * a1R - a2I * a1I,
            a2R * a1I + a2I * a1R,
            a2R * b1R - a2I * b1I + b2R,
            a2R * b1I + a2I * b1R + b2I)


def _selective_scan_complex(u, delta, A, B, C, D=None, z=None,
                            delta_bias=None, delta_softplus=False,
                            return_last_state=False, reverse=False,
                            sequential=False):
    """Complex-A selective scan: y[t] = 2·Re(<C[t], h[t]>) with the
    recurrence over ℂ^n (selective_scan_ref's `y.real * 2`,
    selective_scan_interface.py:198). Output is real; last_state is
    complex64 (batch, d, n)."""
    dtype = u.dtype
    u32, (aR, aI), (bR, bI), (CxR, CxI) = _prepare_complex(
        u, delta, A, B, C, delta_bias, delta_softplus)
    batch, L, d = u.shape
    n = A.shape[1]
    if sequential:
        if reverse:
            flip = lambda x: x[:, ::-1]
            aR, aI, bR, bI = map(flip, (aR, aI, bR, bI))

        def step(h, ab):
            atR, atI, btR, btI = ab
            hR, hI = h
            h = (atR * hR - atI * hI + btR,
                 atR * hI + atI * hR + btI)
            return h, h

        h0 = (jnp.zeros((batch, n, d), jnp.float32),) * 2
        mov = lambda x: jnp.moveaxis(x, 1, 0)
        h_last, hs = lax.scan(step, h0,
                              (mov(aR), mov(aI), mov(bR), mov(bI)))
        hsR, hsI = (jnp.moveaxis(h, 0, 1) for h in hs)
        if reverse:
            hsR, hsI = hsR[:, ::-1], hsI[:, ::-1]
        lastR, lastI = h_last
    else:
        _, _, hsR, hsI = lax.associative_scan(
            _assoc_combine_complex, (aR, aI, bR, bI), axis=1,
            reverse=reverse)
        t_last = 0 if reverse else -1
        lastR, lastI = hsR[:, t_last], hsI[:, t_last]
    y = 2.0 * jnp.sum(hsR * CxR - hsI * CxI, axis=2)
    out = _finalize(y, u32, D, z, dtype)
    if return_last_state:
        last = jax.lax.complex(lastR, lastI).astype(jnp.complex64)
        return out, jnp.swapaxes(last, 1, 2)  # (batch, d, n) complex
    return out


def _finalize(y, u, D, z, dtype):
    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype)


def _flip_bc(mat):
    return mat[:, ::-1] if mat.ndim >= 3 else mat


def selective_scan_ref(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    reverse: bool = False,
):
    """Sequential oracle. u/delta/z: (batch, L, d); A: (d, n); D: (d,).

    B, C: (d, n) | (batch, L, n) | (batch, L, g, n).
    Returns y (batch, L, d) [and last_state (batch, d, n)].

    reverse=True scans right-to-left (h[t] = a[t]·h[t+1] + b[t]) with the
    output in original order — equivalent to flip→scan→flip, letting the
    bidirectional mixer skip full-length flips.
    """
    if reverse:
        out = selective_scan_ref(
            u[:, ::-1], delta[:, ::-1], A, _flip_bc(B), _flip_bc(C), D=D,
            z=None if z is None else z[:, ::-1], delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            return_last_state=return_last_state)
        if return_last_state:
            return out[0][:, ::-1], out[1]
        return out[:, ::-1]
    dtype = u.dtype
    u32, a, b, Cx = _prepare(u, delta, A, B, C, delta_bias, delta_softplus)
    batch, L, d = u.shape
    n = A.shape[1]

    def step(h, ab):
        at, bt = ab  # (batch, n, d)
        h = at * h + bt
        return h, h

    h0 = jnp.zeros((batch, n, d), jnp.float32)
    a_t = jnp.moveaxis(a, 1, 0)
    b_t = jnp.moveaxis(b, 1, 0)
    h_last, hs = lax.scan(step, h0, (a_t, b_t))
    hs = jnp.moveaxis(hs, 0, 1)  # (batch, L, n, d)
    y = jnp.sum(hs * Cx, axis=2)
    out = _finalize(y, u32, D, z, dtype)
    if return_last_state:
        return out, jnp.swapaxes(h_last, 1, 2)  # (batch, d, n)
    return out


def _assoc_combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def selective_scan_assoc(
    u, delta, A, B, C,
    D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False, reverse=False,
):
    """Log-depth associative scan (XLA). Same contract as selective_scan_ref.

    reverse=True uses lax.associative_scan's native reverse mode — a
    suffix scan with no full-length flips materialized.
    """
    dtype = u.dtype
    u32, a, b, Cx = _prepare(u, delta, A, B, C, delta_bias, delta_softplus)
    if reverse:
        # reversed recurrence h[t] = a[t]·h[t+1] + b[t]: reverse=True is
        # exactly flip→scan→flip with the same (non-commutative) combine
        _, hs = lax.associative_scan(_assoc_combine, (a, b), axis=1,
                                     reverse=True)
        last = hs[:, 0]
    else:
        _, hs = lax.associative_scan(_assoc_combine, (a, b), axis=1)
        last = hs[:, -1]
    y = jnp.sum(hs * Cx, axis=2)
    out = _finalize(y, u32, D, z, dtype)
    if return_last_state:
        return out, jnp.swapaxes(last, 1, 2)  # (batch, d, n)
    return out


def selective_scan(
    u, delta, A, B, C,
    D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False, impl: str = "auto", reverse: bool = False,
    pallas_min_l=None,
):
    """Dispatching entry point.

    impl="auto" picks the associative XLA scan for short sequences and the
    Pallas chunked kernel for long ones on TPU (falling back to assoc
    elsewhere). reverse=True scans right-to-left with output in original
    order (the flip-free bidirectional path).

    Complex A (the reference's wtype=complex64 path,
    test_selective_scan.py) is supported by the ref/assoc impls in
    real-pair arithmetic; B/C may be complex or torch-convention real
    (batch, 2L, n[, g]) interleaved pairs. No reference model uses it,
    so it intentionally has no Pallas kernel.
    """
    if jnp.iscomplexobj(A):
        if impl == "pallas":
            raise ValueError("complex-A selective scan has no Pallas "
                             "kernel (unused by every reference model); "
                             "use impl='auto'/'assoc'/'ref'")
        return _selective_scan_complex(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            return_last_state=return_last_state, reverse=reverse,
            sequential=(impl == "ref"))
    if impl == "auto":
        L = u.shape[1]
        on_tpu = jax.default_backend() == "tpu"
        # Pallas threshold 512, MEASURED round 3 (benchmarks/
        # ablate_r3_tpu.py): routing the pooled rows scan (L=128) to the
        # Pallas kernel regresses 86.3 → 69.8 img/s @2048 b3 despite the
        # HLO showing large assoc-scan intermediates — those live in
        # VMEM (S(1) memory space) and the 48 extra pallas_call launches
        # lose to XLA's overlapped schedule. Keep assoc for short scans.
        import os

        # Per-CALLER override (pallas_min_l): the right threshold depends
        # on what the scan can hide behind. Dense FastVim @2048 pooled
        # scans (L=128) OVERLAP the large full-length elementwise
        # streams — Pallas there regressed 86.3→69.8 img/s. ChannelVim's
        # pooled scans (L=112, d_inner=768) have a full-L stream SMALLER
        # than one scan temp, so the assoc sweeps are fully exposed —
        # Pallas measured 5.3x faster fwd (15.7 vs 82.6 ms @224 ps16 C=8
        # b8, interleaved; benchmarks/channel_scan_ab_tpu.py). The env
        # var stays as the global experiment override.
        env = os.environ.get("FASTVIM_PALLAS_MIN_L")
        min_l = (int(env) if env is not None else
                 pallas_min_l if pallas_min_l is not None else 512)
        use_pallas = (
            on_tpu
            and L >= min_l
            and z is None
            and B.ndim == 3
            and C.ndim == 3
            and not return_last_state
        )
        impl = "pallas" if use_pallas else "assoc"
    if impl == "ref":
        fn = selective_scan_ref
    elif impl == "assoc":
        # Known hazard (measured, CLAUDE.md round-2): XLA's associative-scan
        # REVERSE autodiff is numerically wrong on TPU at L>=4096 bf16
        # (rel err up to 1.1 vs fp32 sequential ref; fine at <=2048). The
        # "auto" dispatch routes long TPU scans to Pallas; a user forcing
        # impl="assoc" would hit it silently — warn loudly instead.
        if (reverse and u.shape[1] >= 4096
                and jax.default_backend() == "tpu"):
            import warnings

            warnings.warn(
                "selective_scan(impl='assoc', reverse=True) with L="
                f"{u.shape[1]} on TPU: XLA associative-scan reverse "
                "autodiff is numerically unreliable at L>=4096 (measured "
                "rel err up to 1.1 in bf16). Use impl='pallas' or 'auto' "
                "for long reversed scans.",
                stacklevel=2,
            )
        fn = selective_scan_assoc
    elif impl == "pallas":
        from fastvim_tpu.ops.pallas.selective_scan import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D=D, delta_bias=delta_bias,
            delta_softplus=delta_softplus, reverse=reverse,
        )
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return fn(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus, return_last_state=return_last_state,
        reverse=reverse,
    )


# ---------------------------------------------------------------------------
# Pooled (FastVim) helpers
# ---------------------------------------------------------------------------

def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


def pool_grid(
    x: Array, grid_shape, pool_axes, method: str = "mean",
    scaling_factor: float = 1.0,
) -> Array:
    """Pool a flattened token grid along ``pool_axes``.

    x: (batch, prod(grid_shape), d) in raster order of ``grid_shape``.
    Returns (batch, prod(kept dims), d). Subsumes all the reference's
    pooling reshapes: FastVim cols-pool (mamba_simple_faster.py:287-305),
    ChannelVim Spatial/Channel-First (mamba_simple_channel_faster.py:
    225-256) and 2dcompress (…_2dcompress.py:222-256).
    """
    b, L, d = x.shape
    assert L == _prod(grid_shape), (L, grid_shape)
    xg = x.reshape(b, *grid_shape, d)
    axes = tuple(a + 1 for a in pool_axes)
    if method == "mean":
        out = jnp.mean(xg, axis=axes)
        if scaling_factor != 1.0:
            out = out * scaling_factor
    elif method == "max":
        out = jnp.max(xg, axis=axes)
    else:
        raise ValueError(f"unknown collapse method {method!r}")
    kept = _prod(s for i, s in enumerate(grid_shape) if i not in pool_axes)
    return out.reshape(b, kept, d)


def broadcast_grid(y: Array, grid_shape, pool_axes) -> Array:
    """Inverse of pool_grid: broadcast pooled outputs back over the pooled
    grid axes (the reference's repeat_interleave/repeat broadcasts)."""
    b, Lc, d = y.shape
    kept_shape = [s for i, s in enumerate(grid_shape) if i not in pool_axes]
    assert Lc == _prod(kept_shape), (Lc, grid_shape, pool_axes)
    yg = y.reshape(b, *kept_shape, d)
    for a in sorted(pool_axes):
        yg = jnp.expand_dims(yg, a + 1)
    yg = jnp.broadcast_to(yg, (b, *grid_shape, d))
    return yg.reshape(b, _prod(grid_shape), d)


def pool_tokens(
    x: Array, rows: int, cols: int, method: str = "mean",
    scaling_factor: float = 1.0,
) -> Array:
    """Average/max-pool the token sequence along the fast (col) axis.

    x: (batch, rows*cols, d) in raster order → (batch, rows, d).
    Mirrors the reference's compressed-input construction
    (mamba_simple_faster.py:287-305): reshape (b, d, rows, cols) and reduce
    over cols; here done channels-last.
    """
    b, L, d = x.shape
    assert L == rows * cols, (L, rows, cols)
    xg = x.reshape(b, rows, cols, d)
    if method == "mean":
        out = jnp.mean(xg, axis=2)
        if scaling_factor != 1.0:
            out = out * scaling_factor
    elif method == "max":
        out = jnp.max(xg, axis=2)
    else:
        raise ValueError(f"unknown collapse method {method!r}")
    return out


def broadcast_tokens(y: Array, cols: int) -> Array:
    """Inverse of pool_tokens: repeat each row output to its cols tokens.

    y: (batch, rows, d) → (batch, rows*cols, d). Mirrors
    `repeat_interleave(num_of_col, dim=2)` (mamba_simple_faster.py:356).
    """
    b, rows, d = y.shape
    return jnp.broadcast_to(
        y[:, :, None, :], (b, rows, cols, d)
    ).reshape(b, rows * cols, d)
