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

Backward: `selective_scan_pallas` carries a custom VJP that recomputes the
forward with the XLA associative-scan implementation and differentiates
through it — the chunk-recompute structure of the reference backward kernel
(`selective_scan_bwd_kernel.cuh`) via autodiff rather than hand-written
code. A fully fused Pallas backward is a later optimization.
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


def _scan_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                 out_ref, state_ref, *, delta_softplus: bool, block_l: int):
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)

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

    # Hillis–Steele log-depth inclusive scan along the chunk axis.
    n, bd = A.shape
    shift = 1
    while shift < block_l:
        ones = jnp.ones((shift, n, bd), jnp.float32)
        zeros = jnp.zeros((shift, n, bd), jnp.float32)
        a_sh = jnp.concatenate([ones, a[:-shift]], axis=0)
        b_sh = jnp.concatenate([zeros, b[:-shift]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
        shift *= 2

    # Apply the carried prefix state from previous chunks.
    h = b + a * state_ref[...][None, :, :]                  # (BL, N, BD)
    # static slice (negative jnp indexing lowers to dynamic_slice, which
    # Mosaic does not support)
    state_ref[...] = jax.lax.slice_in_dim(
        h, block_l - 1, block_l, axis=0)[0]

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


def _pallas_fwd(u, delta, A, B, C, D, delta_bias, delta_softplus,
                block_l: int, block_d: int, interpret: bool):
    batch, L, d = u.shape
    n = A.shape[1]
    orig_L = L
    pad = (-L) % block_l
    if pad:
        # delta=0 ⇒ a=1, b=0: padded steps carry state unchanged; padded
        # outputs are sliced off below.
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
        L += pad
    assert d % block_d == 0, (d, block_d)

    A_t = A.astype(jnp.float32).T  # (n, d)
    bias = (delta_bias if delta_bias is not None
            else jnp.zeros((d,))).astype(jnp.float32)[None, :]
    Dp = (D if D is not None else jnp.zeros((d,))).astype(jnp.float32)[None, :]

    grid = (batch, d // block_d, L // block_l)
    kernel = functools.partial(
        _scan_kernel, delta_softplus=delta_softplus, block_l=block_l)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j)),
            pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, l, 0)),
            pl.BlockSpec((1, block_l, n), lambda b, j, l: (b, l, 0)),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_l, block_d),
                               lambda b, j, l: (b, l, j)),
        out_shape=jax.ShapeDtypeStruct((batch, L, d), u.dtype),
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, A_t, bias, Dp)
    if pad:
        out = out[:, :orig_L]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, block_l, block_d, interpret,
                           variant="sublane"):
    impl = _pallas_fwd_lanes if variant == "lanes" else _pallas_fwd
    return impl(u, delta, A, B, C, D, delta_bias, delta_softplus,
                block_l, block_d, interpret)


def _fwd(u, delta, A, B, C, D, delta_bias, delta_softplus, block_l, block_d,
         interpret, variant="sublane"):
    impl = _pallas_fwd_lanes if variant == "lanes" else _pallas_fwd
    out = impl(u, delta, A, B, C, D, delta_bias, delta_softplus,
               block_l, block_d, interpret)
    return out, (u, delta, A, B, C, D, delta_bias)


def _bwd(delta_softplus, block_l, block_d, interpret, variant, res, g):
    u, delta, A, B, C, D, delta_bias = res
    has_D = D is not None
    has_bias = delta_bias is not None

    def f(u, delta, A, B, C, D, delta_bias):
        return selective_scan_assoc(
            u, delta, A, B, C,
            D=D if has_D else None,
            delta_bias=delta_bias if has_bias else None,
            delta_softplus=delta_softplus)

    zeros_D = D if has_D else jnp.zeros(u.shape[-1:], jnp.float32)
    zeros_b = delta_bias if has_bias else jnp.zeros(u.shape[-1:], jnp.float32)
    _, vjp = jax.vjp(f, u, delta, A, B, C, zeros_D, zeros_b)
    du, ddelta, dA, dB, dC, dD, dbias = vjp(g)
    return (du, ddelta, dA, dB, dC,
            dD if has_D else None, dbias if has_bias else None)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    u: Array, delta: Array, A: Array, B: Array, C: Array,
    D: Optional[Array] = None, delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    block_l: int = 128, block_d: int = 128,
    interpret: Optional[bool] = None,
    variant: str = "sublane",
) -> Array:
    """Fused TPU scan. u/delta (batch, L, d); B/C (batch, L, n) variable.

    Same contract as `selective_scan_ref` restricted to variable B/C, no z
    gate, no last-state return (the FastVim/Vim vision paths).

    variant="lanes": time-on-lanes layout with roll-based doubling scan
    (avoids sublane-shift relayouts at the cost of one XLA transpose of
    the inputs/outputs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = u.shape[-1]
    block_d = min(block_d, d)
    block_l = min(block_l, max(8, u.shape[1]))
    return _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                                  delta_softplus, block_l, block_d,
                                  interpret, variant)
