"""Chunked Pallas TPU selective-scan kernel.

TPU-native replacement for the reference CUDA kernels
(`mamba-1p1p1/csrc/selective_scan/selective_scan_fwd_kernel.cuh` and the
fastvim_kernel fork): the same chunk-with-carried-prefix-state structure
(cf. `running_prefix`, fwd_kernel.cuh:201-203), but mapped to TPU:

* grid = (batch, d_inner/BD, L/BL); the L axis is innermost and sequential,
  with the (N, BD) carry state living in VMEM scratch across grid steps —
  the TPU analogue of the CUDA chunk loop.
* within a chunk, the inclusive first-order recurrence is computed with a
  log-depth Hillis–Steele doubling scan on (BL, N, BD) VMEM blocks — the
  analogue of cub's BlockScan with `SSMScanOp`
  (selective_scan_common.h:108) — all VPU elementwise work.
* softplus(delta + bias), the B*u input projection, the C contraction and
  the D*u skip term are fused into the same kernel, so HBM traffic is just
  u, delta, B, C in and y out (the reference does the same fusion).

The scan math is fp32 throughout (as in the reference kernels); inputs may
be bf16.

Reverse scans run NATIVELY in the kernel (`reverse=True`): chunks are
visited in reverse grid order and the in-chunk doubling scan runs as a
suffix scan — zero full-length flips (the reference materializes a flipped
copy; its kernel has `reverse_scan.cuh` for the same reason).

Backward: a fused Pallas kernel with the reference's chunk-recompute
structure (`selective_scan_bwd_kernel.cuh`): the forward saves only the
(batch, n_chunks, N, BD) per-chunk carry states; the backward revisits
chunks in reverse scan order, recomputes h within the chunk from the saved
prefix, runs the adjoint suffix scan for λ = ∂L/∂h with a carried λ-state,
and emits all input gradients — peak memory O(L·(n+d)) instead of the
associative-autodiff path's O(L·n·d) fp32 intermediates (~3 GB at L=16k,
d=384).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastvim_tpu.ops.scan import selective_scan_assoc

Array = jax.Array


def _doubling_scan(a, b, block_l: int, reverse: bool):
    """In-chunk inclusive Hillis–Steele scan of the first-order linear
    recurrence (cub BlockScan + SSMScanOp analogue). ``reverse`` runs the
    suffix form h[t] = a[t]·h[t+1] + b[t]."""
    n, bd = a.shape[1], a.shape[2]
    shift = 1
    while shift < block_l:
        ones = jnp.ones((shift, n, bd), jnp.float32)
        zeros = jnp.zeros((shift, n, bd), jnp.float32)
        if reverse:
            a_sh = jnp.concatenate([a[shift:], ones], axis=0)
            b_sh = jnp.concatenate([b[shift:], zeros], axis=0)
        else:
            a_sh = jnp.concatenate([ones, a[:-shift]], axis=0)
            b_sh = jnp.concatenate([zeros, b[:-shift]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
        shift *= 2
    return a, b


def _row(x, i: int):
    """Static row slice (negative jnp indexing lowers to dynamic_slice,
    which Mosaic rejects)."""
    return jax.lax.slice_in_dim(x, i, i + 1, axis=0)[0]


def _scan_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                 out_ref, state_ref, *, delta_softplus: bool, block_l: int,
                 reverse: bool, states_out_ref=None):
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    if states_out_ref is not None:
        # carry state at chunk ENTRY — the backward's recompute prefix
        states_out_ref[0, 0] = state_ref[...]

    u = u_ref[0].astype(jnp.float32)          # (BL, BD)
    delta = dt_ref[0].astype(jnp.float32)     # (BL, BD)
    delta = delta + bias_ref[0][None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    A = A_ref[...]                            # (N, BD) fp32 (= -exp(A_log))
    Bm = B_ref[0].astype(jnp.float32)         # (BL, N)
    Cm = C_ref[0].astype(jnp.float32)         # (BL, N)

    a = jnp.exp(delta[:, None, :] * A[None, :, :])          # (BL, N, BD)
    b = (delta * u)[:, None, :] * Bm[:, :, None]            # (BL, N, BD)

    a, b = _doubling_scan(a, b, block_l, reverse)

    # Apply the carried prefix (suffix, if reverse) state.
    h = b + a * state_ref[...][None, :, :]                  # (BL, N, BD)
    state_ref[...] = _row(h, 0 if reverse else block_l - 1)

    y = jnp.sum(h * Cm[:, :, None], axis=1)                 # (BL, BD)
    y = y + D_ref[0][None, :] * u
    out_ref[0] = y.astype(out_ref.dtype)


def _scan_kernel_lanes(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                       out_ref, state_ref, *, delta_softplus: bool,
                       block_l: int):
    """Lane-major variant: inputs pre-transposed so the TIME dim rides the
    lane dimension — the log-depth doubling scan becomes lane rolls
    instead of sublane concat/slice relayouts.

    MEASURED (v5e, L=16k, d=384): 3-4× SLOWER than the sublane variant —
    lane rolls are cross-lane permutes, costlier than sublane shifts.
    Kept as a documented negative result + coverage for pltpu.roll.

    u/dt blocks: (1, BD, BL); B/C blocks: (1, n, BL); A: (n, BD);
    out: (1, BD, BL); carried state: (n, BD)."""
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

    u = u_ref[0].astype(jnp.float32)          # (BD, BL)
    delta = dt_ref[0].astype(jnp.float32)     # (BD, BL)
    delta = delta + bias_ref[...]             # (BD, 1) broadcasts
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    A = A_ref[...]                            # (n, BD)
    Bm = B_ref[0].astype(jnp.float32)         # (n, BL)
    Cm = C_ref[0].astype(jnp.float32)         # (n, BL)

    a = jnp.exp(delta[None, :, :] * A[:, :, None])        # (n, BD, BL)
    b = (delta * u)[None, :, :] * Bm[:, None, :]          # (n, BD, BL)

    n, bd = A.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_l), 2)
    shift = 1
    while shift < block_l:
        a_sh = pltpu.roll(a, shift, axis=2)
        b_sh = pltpu.roll(b, shift, axis=2)
        mask = lane >= shift
        b = b + jnp.where(mask, a * b_sh, 0.0)
        a = a * jnp.where(mask, a_sh, 1.0)
        shift *= 2

    h = b + a * state_ref[...][:, :, None]                # (n, BD, BL)
    state_ref[...] = jax.lax.slice_in_dim(
        h, block_l - 1, block_l, axis=2)[:, :, 0]

    y = jnp.sum(h * Cm[:, None, :], axis=0)               # (BD, BL)
    y = y + D_ref[...] * u                                # (BD, 1) bcast
    out_ref[0] = y.astype(out_ref.dtype)


def _pallas_fwd_lanes(u, delta, A, B, C, D, delta_bias, delta_softplus,
                      block_l: int, block_d: int, interpret: bool):
    """Lane-major launcher: transposes to (B, D, L)/(B, n, L) in XLA (one
    pass over HBM) and runs the roll-based kernel."""
    batch, L, d = u.shape
    n = A.shape[1]
    orig_L = L
    pad = (-L) % block_l
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
        L += pad
    assert d % block_d == 0, (d, block_d)

    u_t = jnp.swapaxes(u, 1, 2)          # (B, D, L)
    dt_t = jnp.swapaxes(delta, 1, 2)
    B_t = jnp.swapaxes(B, 1, 2)          # (B, n, L)
    C_t = jnp.swapaxes(C, 1, 2)
    A_t = A.astype(jnp.float32).T        # (n, d)
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d,))).astype(jnp.float32)[:, None]  # (d, 1)
    Dp = (D if D is not None else jnp.zeros((d,))).astype(
        jnp.float32)[:, None]

    grid = (batch, d // block_d, L // block_l)
    kernel = functools.partial(
        _scan_kernel_lanes, delta_softplus=delta_softplus, block_l=block_l)
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_d, block_l), lambda b, j, l: (b, j, l)),
            pl.BlockSpec((1, block_d, block_l), lambda b, j, l: (b, j, l)),
            pl.BlockSpec((1, n, block_l), lambda b, j, l: (b, 0, l)),
            pl.BlockSpec((1, n, block_l), lambda b, j, l: (b, 0, l)),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((block_d, 1), lambda b, j, l: (j, 0)),
            pl.BlockSpec((block_d, 1), lambda b, j, l: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_d, block_l),
                               lambda b, j, l: (b, j, l)),
        out_shape=jax.ShapeDtypeStruct((batch, d, L), u.dtype),
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        interpret=interpret,
    )(u_t, dt_t, B_t, C_t, A_t, bias, Dp)
    out = jnp.swapaxes(out_t, 1, 2)
    if pad:
        out = out[:, :orig_L]
    return out


def _pad_inputs(u, delta, B, C, block_l):
    """Right-pad L to a block multiple. u=0 makes padded b-terms zero, so
    the carry state is unaffected in BOTH scan directions; padded outputs
    are sliced off by the caller."""
    batch, L, d = u.shape
    pad = (-L) % block_l
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    return u, delta, B, C, L + pad, pad


def _pallas_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus,
                block_l: int, block_d: int, interpret: bool,
                reverse: bool = False, save_states: bool = False):
    batch, orig_L, d = u.shape
    n = A.shape[1]
    u, delta, B, C, L, pad = _pad_inputs(u, delta, B, C, block_l)
    assert d % block_d == 0, (d, block_d)

    A_t = A.astype(jnp.float32).T  # (n, d)
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d,))).astype(jnp.float32)[None, :]
    Dp = (D if D is not None else jnp.zeros((d,))).astype(jnp.float32)[None, :]

    nl = L // block_l
    # chunk visit order: scan direction (reversed grid for reverse scans)
    lc = (lambda l: nl - 1 - l) if reverse else (lambda l: l)
    grid = (batch, d // block_d, nl)
    kernel = functools.partial(
        _scan_kernel, delta_softplus=delta_softplus, block_l=block_l,
        reverse=reverse)
    out_shapes = [jax.ShapeDtypeStruct((batch, L, d), u.dtype)]
    out_specs = [pl.BlockSpec((1, block_l, block_d),
                              lambda b, j, l: (b, lc(l), j))]
    if save_states:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, nl, n, d), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, n, block_d),
                                      lambda b, j, l: (b, lc(l), 0, j)))

        def kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                   out_ref, states_ref, state_scr):
            _scan_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref,
                         D_ref, out_ref, state_scr,
                         delta_softplus=delta_softplus, block_l=block_l,
                         reverse=reverse, states_out_ref=states_ref)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, lc(l), 0)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, lc(l), 0)),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
        ],
        out_specs=out_specs if save_states else out_specs[0],
        out_shape=out_shapes if save_states else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, A_t, bias, Dp)
    out, states = outs if save_states else (outs, None)
    if pad:
        out = out[:, :orig_L]
    return (out, states) if save_states else out


def _bwd_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                g_ref, h_in_ref,
                du_ref, ddt_ref, dB_ref, dC_ref, dA_ref, dbias_ref, dD_ref,
                lam_ref, *, delta_softplus: bool, block_l: int,
                reverse: bool):
    """Chunk-recompute backward (selective_scan_bwd_kernel.cuh structure):
    rebuild h within the chunk from the saved entry state, run the adjoint
    λ recurrence (opposite direction to the scan) with a carried λ-state,
    and emit all input grads. Chunks are visited in reverse scan order."""
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        lam_ref[...] = jnp.zeros_like(lam_ref)
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dD_ref[...] = jnp.zeros_like(dD_ref)

    u = u_ref[0].astype(jnp.float32)             # (BL, BD)
    delta_in = dt_ref[0].astype(jnp.float32) + bias_ref[0][None, :]
    if delta_softplus:
        sp_grad = jax.nn.sigmoid(delta_in)
        delta = jax.nn.softplus(delta_in)
    else:
        delta = delta_in
    A = A_ref[...]                               # (N, BD)
    Bm = B_ref[0].astype(jnp.float32)            # (BL, N)
    Cm = C_ref[0].astype(jnp.float32)            # (BL, N)
    g = g_ref[0].astype(jnp.float32)             # (BL, BD)
    h_in = h_in_ref[0, 0]                        # (N, BD)

    a = jnp.exp(delta[:, None, :] * A[None, :, :])      # (BL, N, BD)
    bvec = (delta * u)[:, None, :] * Bm[:, :, None]

    # recompute h in the chunk (same doubling scan as forward)
    a_s, b_s = _doubling_scan(a, bvec, block_l, reverse)
    h = b_s + a_s * h_in[None]
    if reverse:
        # scan-order predecessor of t is t+1
        h_prev = jnp.concatenate(
            [h[1:], h_in[None]], axis=0)
    else:
        h_prev = jnp.concatenate(
            [h_in[None], h[:block_l - 1]], axis=0)

    # λ[t] = C[t]·g[t] + a[t_next]·λ[t_next]; adjoint runs OPPOSITE to
    # the scan. ã is a shifted one step against scan order; the carried
    # λ-state enters at the chunk's scan-order-last element.
    local = Cm[:, :, None] * g[:, None, :]              # (BL, N, BD)
    n, bd = A.shape
    if reverse:
        a_t = jnp.concatenate(
            [jnp.zeros((1, n, bd), jnp.float32), a[:block_l - 1]], axis=0)
        edge = 0  # scan-order-last element of a reverse scan is t=0
    else:
        a_t = jnp.concatenate(
            [a[1:], jnp.zeros((1, n, bd), jnp.float32)], axis=0)
        edge = block_l - 1
    local = local + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (block_l, 1, 1), 0) == edge,
        lam_ref[...][None], 0.0)
    # adjoint doubling scan: direction opposite to the forward scan
    _, lam = _doubling_scan(a_t, local, block_l, reverse=not reverse)
    lam_ref[...] = _row(a, block_l - 1 if reverse else 0) * \
        _row(lam, block_l - 1 if reverse else 0)

    da = lam * h_prev                                   # (BL, N, BD)
    db = lam
    dC_ref[0, 0] = jnp.sum(h * g[:, None, :], axis=2).astype(dC_ref.dtype)
    dB_ref[0, 0] = jnp.sum(db * (delta * u)[:, None, :],
                           axis=2).astype(dB_ref.dtype)
    du = jnp.sum(db * Bm[:, :, None], axis=1) * delta \
        + D_ref[0][None, :] * g
    du_ref[0] = du.astype(du_ref.dtype)
    ddelta = jnp.sum(da * a * A[None], axis=1) \
        + jnp.sum(db * Bm[:, :, None], axis=1) * u
    if delta_softplus:
        ddelta = ddelta * sp_grad
    ddt_ref[0] = ddelta.astype(ddt_ref.dtype)
    dA_ref[0] += jnp.sum(da * a * delta[:, None, :], axis=0)
    dbias_ref[0, 0] += jnp.sum(ddelta, axis=0)
    dD_ref[0, 0] += jnp.sum(g * u, axis=0)


def _pallas_bwd(u, delta, A, B, C, D, delta_bias, states, g,
                delta_softplus, block_l, block_d, interpret,
                reverse: bool):
    batch, orig_L, d = u.shape
    n = A.shape[1]
    u, delta, B, C, L, pad = _pad_inputs(u, delta, B, C, block_l)
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    nl = L // block_l
    assert states.shape == (batch, nl, n, d), (states.shape, nl)

    A_t = A.astype(jnp.float32).T
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d,))).astype(jnp.float32)[None, :]
    Dp = (D if D is not None else jnp.zeros((d,))).astype(jnp.float32)[None, :]

    # bwd visits chunks in reverse SCAN order
    lc = (lambda l: l) if reverse else (lambda l: nl - 1 - l)
    nj = d // block_d
    grid = (batch, nj, nl)
    kernel = functools.partial(
        _bwd_kernel, delta_softplus=delta_softplus, block_l=block_l,
        reverse=reverse)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, lc(l), 0)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, lc(l), 0)),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),
            pl.BlockSpec((1, 1, n, block_d),
                         lambda b, j, l: (b, lc(l), 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),      # du
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, lc(l), j)),      # ddelta
            pl.BlockSpec((1, 1, block_l, n),
                         lambda b, j, l: (b, j, lc(l), 0)),   # dB partial
            pl.BlockSpec((1, 1, block_l, n),
                         lambda b, j, l: (b, j, lc(l), 0)),   # dC partial
            pl.BlockSpec((1, n, block_d),
                         lambda b, j, l: (b, 0, j)),          # dA partial
            pl.BlockSpec((1, 1, block_d),
                         lambda b, j, l: (b, 0, j)),          # dbias partial
            pl.BlockSpec((1, 1, block_d),
                         lambda b, j, l: (b, 0, j)),          # dD partial
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, d), f32),
            jax.ShapeDtypeStruct((batch, L, d), f32),
            jax.ShapeDtypeStruct((batch, nj, L, n), f32),
            jax.ShapeDtypeStruct((batch, nj, L, n), f32),
            jax.ShapeDtypeStruct((batch, n, d), f32),
            jax.ShapeDtypeStruct((batch, 1, d), f32),
            jax.ShapeDtypeStruct((batch, 1, d), f32),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, A_t, bias, Dp, g, states)
    du, ddelta, dBp, dCp, dAp, dbiasp, dDp_ = outs
    dB = dBp.sum(axis=1)
    dC = dCp.sum(axis=1)
    dA = dAp.sum(axis=0).T  # kernel works in (n, d); A is (d, n)
    dbias = dbiasp.sum(axis=(0, 1))
    dD = dDp_.sum(axis=(0, 1))
    if pad:
        du = du[:, :orig_L]
        ddelta = ddelta[:, :orig_L]
        dB = dB[:, :orig_L]
        dC = dC[:, :orig_L]
    return du, ddelta, dA, dB, dC, dD, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, block_l, block_d, interpret,
                           variant="sublane", reverse=False):
    if variant == "lanes":
        if reverse:
            raise NotImplementedError(
                "variant='lanes' is forward-only (negative-result "
                "coverage); use the default sublane variant for reverse")
        return _pallas_fwd_lanes(u, delta, A, B, C, D, delta_bias,
                                 delta_softplus, block_l, block_d,
                                 interpret)
    return _pallas_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus,
                       block_l, block_d, interpret, reverse=reverse)


def _fwd(u, delta, A, B, C, D, delta_bias, delta_softplus, block_l, block_d,
         interpret, variant="sublane", reverse=False):
    if variant == "lanes":
        if reverse:
            raise NotImplementedError(
                "variant='lanes' is forward-only; use the sublane variant")
        out = _pallas_fwd_lanes(u, delta, A, B, C, D, delta_bias,
                                delta_softplus, block_l, block_d, interpret)
        return out, (u, delta, A, B, C, D, delta_bias, None)
    out, states = _pallas_fwd(u, delta, A, B, C, D, delta_bias,
                              delta_softplus, block_l, block_d, interpret,
                              reverse=reverse, save_states=True)
    return out, (u, delta, A, B, C, D, delta_bias, states)


def _bwd(delta_softplus, block_l, block_d, interpret, variant, reverse,
         res, g):
    u, delta, A, B, C, D, delta_bias, states = res
    has_D = D is not None
    has_bias = delta_bias is not None

    if states is None:
        # lanes variant (fwd-only negative-result coverage): recompute
        # through the XLA associative scan
        def f(u, delta, A, B, C, D, delta_bias):
            return selective_scan_assoc(
                u, delta, A, B, C,
                D=D if has_D else None,
                delta_bias=delta_bias if has_bias else None,
                delta_softplus=delta_softplus)

        zeros_D = D if has_D else jnp.zeros(u.shape[-1:], jnp.float32)
        zeros_b = (delta_bias if has_bias
                   else jnp.zeros(u.shape[-1:], jnp.float32))
        _, vjp = jax.vjp(f, u, delta, A, B, C, zeros_D, zeros_b)
        du, ddelta, dA, dB, dC, dD, dbias = vjp(g)
        return (du, ddelta, dA, dB, dC,
                dD if has_D else None, dbias if has_bias else None)

    du, ddelta, dA, dB, dC, dD, dbias = _pallas_bwd(
        u, delta, A, B, C, D, delta_bias, states, g,
        delta_softplus, block_l, block_d, interpret, reverse)
    return (du.astype(u.dtype), ddelta.astype(delta.dtype),
            dA.astype(A.dtype), dB.astype(B.dtype), dC.astype(C.dtype),
            dD.astype(D.dtype) if has_D else None,
            dbias.astype(delta_bias.dtype) if has_bias else None)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    u: Array, delta: Array, A: Array, B: Array, C: Array,
    D: Optional[Array] = None, delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    block_l: int = 128, block_d: int = 128,
    interpret: Optional[bool] = None,
    variant: str = "sublane",
    reverse: bool = False,
) -> Array:
    """Fused TPU scan. u/delta (batch, L, d); B/C (batch, L, n) variable.

    Same contract as `selective_scan_ref` restricted to variable B/C, no z
    gate, no last-state return (the FastVim/Vim vision paths).

    reverse=True runs the suffix recurrence natively in the kernel (no
    full-length flips — the reference's reverse_scan.cuh counterpart).

    Differentiable: the custom VJP is a fused Pallas backward with the
    reference's chunk-recompute structure (per-chunk entry states saved
    by the forward), O(L·(n+d)) residual memory.

    variant="lanes": time-on-lanes layout with roll-based doubling scan
    (avoids sublane-shift relayouts at the cost of one XLA transpose of
    the inputs/outputs). Forward-only; falls back to assoc-autodiff bwd.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = u.shape[-1]
    block_d = min(block_d, d)
    block_l = min(block_l, max(8, u.shape[1]))
    return _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                                  delta_softplus, block_l, block_d,
                                  interpret, variant, reverse)
