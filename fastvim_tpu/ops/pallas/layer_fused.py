"""Two-pass fused FastVim mixer layer — the "megakernel".

docs/PERF.md §2: the measured 2048px forward sits AT the fully-
materialized HBM roofline (Model A, ~30 ms); every sub-chain fusion
loses because XLA latency-hides the elementwise chains behind the
in_proj/out_proj MXU streams (8 measured attempts, §3). The only fusion
shape with real headroom left is Model B — a kernel that owns the
ENTIRE layer including both GEMMs, so there is nothing left to forfeit:

  pass A:  x̂ ──GEMM(in_proj·x-half)──conv(f,b)──silu──┬─► xc_f, xc_b
                                                       └─pool─► pf, pb
  (XLA)    pf/pb ──x_proj/dt GEMMs──selective scans──► yf, yb   (tiny)
  pass B:  x̂ ──GEMM(z-half)──silu─┐
           xc_f/xc_b, yf/yb ──bcast+D·xc──merge──LN──·──GEMM(out)─► out

The pool→scan→broadcast dependency forces the two passes (the backward
scan needs the last row pooled before the first token's output exists).
Measured (1×v5e, FastVim-T @2048, XLA path 86.6 img/s): default
materialized-xc mode b2 **201 / b3 168.5 img/s** (sweep: b2 201, b3
166, b4 113, b6 99, b8 108). The byte-minimal variant
(FASTVIM_LF_RECOMPUTE=1: pass A writes only the ~0.3 MB pooled arrays,
pass B re-runs the x-half GEMM + conv — ~4× fewer HBM bytes/layer)
measured SLOWER: b1 133 / b2 136 / b3 123 — the kernels are VPU-bound
on the fp32 conv rolls, not HBM-bound, so recompute costs more than
the xc round-trip. Kept opt-in as the measured negative.

Orientations (models/blocks.py):
* even layers: conv along the flat raster (ops/conv.dual_conv1d),
  pool over cols → one pooled value per row. Token tiles are RT whole
  rows; the conv runs as 7 shared sublane rolls over the flat
  (RT·W, d_inner) tile plus 3-token boundary corrections against the
  neighbouring rows (passed as extra one-row blocks).
* odd/transposed layers: conv along the transposed raster
  (ops/conv.grid_dual_conv1d axis=0 semantics incl. the cross-column
  wrap), pool over rows → one pooled value per column. Column tiles
  (H, CT); the conv is rolls along the *leading* H axis (cheap — no
  sublane relayout) plus per-column wrap corrections against the
  neighbouring columns.

Backward: custom VJP re-runs the pure-JAX reference (`_reference_core`,
exactly the mixer's XLA math) under jax.vjp — rematerialization, the
same cost as training without the kernel. The fused path is therefore
primarily an inference/forward optimization; training through it is
correct but gains nothing.

Reference parity: mamba_simple_faster.py:269-453 defines the math (via
the mixer); the fused kernel is locked against the XLA path by
tests/test_layer_fused.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

PAD = 3  # d_conv - 1


def _silu(v):
    """All-vector-operand silu (Mosaic bf16 vector.broadcast workaround,
    see ops/pallas/fused_block.py)."""
    return v / (jnp.ones_like(v) + jnp.exp(-v))


def _roll(x, shift, axis, interpret):
    if shift == 0:
        return x
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    # pltpu.roll wants non-negative shifts; -k ≡ N-k (circular)
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def fusable(grid_shape, pool_axes, transposed: bool, d_inner: int,
            d_conv: int, collapse_method: str) -> bool:
    if len(grid_shape) != 2 or d_conv != 4 or collapse_method != "mean":
        return False
    H, W = grid_shape
    if transposed:
        if tuple(pool_axes) != (0,):
            return False
    elif tuple(pool_axes) != (1,):
        return False
    # Mosaic layout constraints: pooled/sublane extents 8-aligned,
    # d_inner on full lane tiles, grid axes long enough that conv taps
    # wrap at most one line.
    return (H % 8 == 0 and W % 8 == 0 and d_inner % 128 == 0
            and H >= d_conv and W >= d_conv)


def _pick_tile(extent: int, other: int, di: int = 384) -> int:
    """Largest divisor of ``extent`` giving ~1024-token tiles, floored
    at 8: the pooled output block (1, tile, di) must keep its sublane
    dim divisible by 8 (Mosaic block rule). VMEM headroom for large
    d_inner is granted via `_vmem_limit` instead of shrinking the tile
    (FastVim-S's fp32 temporaries exceed the default 16 MB scoped
    budget at 1024 tokens)."""
    want = max(1, 1024 // other)
    best = 1
    for t in range(1, min(extent, want) + 1):
        if extent % t == 0:
            best = t
    return max(best, 8) if extent % 8 == 0 else best


def _vmem_limit(tile_tokens: int, di: int) -> int:
    """Scoped-VMEM ceiling for the kernels: ~8 fp32 tile-sized
    temporaries (xin/yc/ya/z/m + rolls) plus slack, min 32 MB."""
    need = tile_tokens * di * 4 * 10
    return max(32 * 1024 * 1024, min(need, 120 * 1024 * 1024))


# ----------------------------------------------------------------------
# shared conv stage: in_proj(x-half) GEMM + dual conv + silu, in-kernel
# ----------------------------------------------------------------------

def _conv_corrections(wc, wa, dtail, dhead):
    """Boundary corrections for rolled convs. dtail/dhead: (3, ..., d) —
    (true neighbour − wrapped-in) conv-input values at the 3 positions
    before/after the rolled axis. Returns (corr_c, corr_a), each
    (3, ..., d): add corr_c at the first 3 positions (causal:
    Δ[c] = Σ_{j=c..2} wc[j-c]·dtail[j]) and corr_a at the last 3
    (anticausal: Δ[c] = Σ_{m=0..c} wa[c-m]·dhead[m]) of the conv axis.
    Derivation: the roll wraps in the axis's own far end; the true tap
    is the neighbouring line's far end (ops/conv.dual_conv1d /
    grid_dual_conv1d boundary semantics)."""
    cc, ca = [], []
    for c in range(PAD):
        acc = None
        for j in range(c, PAD):
            t = dtail[j:j + 1] * wc[j - c][None]
            acc = t if acc is None else acc + t
        cc.append(acc)
        acc = None
        for m in range(c + 1):
            t = dhead[m:m + 1] * wa[c - m][None]
            acc = t if acc is None else acc + t
        ca.append(acc)
    return jnp.concatenate(cc, 0), jnp.concatenate(ca, 0)


def _conv_stage_even(xh_ref, prev_ref, next_ref, winx_ref, binx_ref,
                     wcf_ref, bcf_ref, wab_ref, bab_ref, dt,
                     *, RT, W, dm, di, nt, interpret):
    """x-half GEMM + flat-raster dual conv + silu over one RT-row tile.
    Returns (xcf, xcb), each (RT*W, di) fp32."""
    i = pl.program_id(1)
    f32 = jnp.float32
    T = RT * W
    winx = winx_ref[...].astype(dt)
    binx = binx_ref[...].astype(f32)
    # conv math stays fp32 in-kernel: Mosaic's vector rotate only
    # supports 32-bit element types (and the scan math is fp32 anyway)
    xin = jnp.dot(xh_ref[0].reshape(T, dm).astype(dt), winx,
                  preferred_element_type=f32) + binx     # (T, di) f32

    # neighbour-row conv inputs for the tile-boundary corrections
    def edge(ref, keep):
        e = jnp.dot(ref[0, 0].astype(dt), winx,
                    preferred_element_type=f32) + binx
        return e * keep.astype(f32)                      # (W, di) f32

    prev_row = edge(prev_ref, i > 0)
    next_row = edge(next_ref, i < nt - 1)
    tail_true = prev_row[W - PAD:]                       # (3, di)
    head_true = next_row[:PAD]
    tail_wrap = xin[T - PAD:]
    head_wrap = xin[:PAD]

    wc = wcf_ref[...].astype(f32)                        # (4, di)
    wa = wab_ref[...].astype(f32)
    yc = None
    ya = None
    for k in range(PAD + 1):
        tc = _roll(xin, PAD - k, 0, interpret) * wc[k][None]
        yc = tc if yc is None else yc + tc
        ta = _roll(xin, -k, 0, interpret) * wa[PAD - k][None]
        ya = ta if ya is None else ya + ta
    corr_c, corr_a = _conv_corrections(
        wc, wa, tail_true - tail_wrap, head_true - head_wrap)
    zfill = jnp.zeros((T - PAD, di), f32)
    yc = yc + jnp.concatenate([corr_c, zfill], 0)
    ya = ya + jnp.concatenate([zfill, corr_a], 0)
    xcf = _silu(yc + bcf_ref[...].astype(f32))           # (T, di) f32
    xcb = _silu(ya + bab_ref[...].astype(f32))
    return xcf, xcb


def _conv_stage_odd(xh_ref, prev_ref, next_ref, winx_ref, binx_ref,
                    wcf_ref, bcf_ref, wab_ref, bab_ref, dt,
                    *, H, CT, dm, di, nt, interpret):
    """x-half GEMM + transposed-raster dual conv (conv along the leading
    H axis with cross-column wrap) + silu over one CT-column tile.
    Returns (xcf, xcb), each (H, CT, di) fp32."""
    j = pl.program_id(1)
    f32 = jnp.float32
    winx = winx_ref[...].astype(dt)
    binx = binx_ref[...].astype(f32)
    xin = jnp.dot(xh_ref[0].reshape(H * CT, dm).astype(dt), winx,
                  preferred_element_type=f32) + binx
    xin = xin.reshape(H, CT, di)                         # f32

    # prev/next refs are FULL neighbour column-tiles (a (…, 1, dm)
    # block would violate Mosaic's 8/128 block rule); only one column
    # of each goes through the edge GEMM.
    def edge(ref, col, keep):
        one = ref[0, :, col:col + 1, :].reshape(H, dm)  # int index on a
        # middle dim lowers to an (unsupported) gather; keepdim slice +
        # reshape is a plain strided load
        e = jnp.dot(one.astype(dt), winx,
                    preferred_element_type=f32) + binx
        return e * keep.astype(f32)                      # (H, di) f32

    prev_col = edge(prev_ref, CT - 1, j > 0)
    next_col = edge(next_ref, 0, j < nt - 1)

    # conv along the leading H axis (transposed-raster order)
    wc = wcf_ref[...].astype(f32)
    wa = wab_ref[...].astype(f32)
    yc = None
    ya = None
    for k in range(PAD + 1):
        tc = _roll(xin, PAD - k, 0, interpret) * wc[k][None, None]
        yc = tc if yc is None else yc + tc
        ta = _roll(xin, -k, 0, interpret) * wa[PAD - k][None, None]
        ya = ta if ya is None else ya + ta
    # cross-column wrap: first 3 rows of column ct take taps from the
    # tail of column ct-1 (roll wrapped in column ct's own tail)
    tail_self = xin[H - PAD:]                         # (3, CT, di)
    head_self = xin[:PAD]
    # slice + newaxis (`a[i:, None]`) falls back to a gather in jnp's
    # rewriting_take, which Mosaic can't lower — explicit reshape instead
    tail_true = jnp.concatenate(
        [prev_col[H - PAD:].reshape(PAD, 1, di),
         tail_self[:, :CT - 1]], 1)
    head_true = jnp.concatenate(
        [head_self[:, 1:], next_col[:PAD].reshape(PAD, 1, di)], 1)
    corr_c, corr_a = _conv_corrections(
        wc, wa, tail_true - tail_self, head_true - head_self)
    zfill = jnp.zeros((H - PAD, CT, di), jnp.float32)
    yc = yc + jnp.concatenate([corr_c, zfill], 0)
    ya = ya + jnp.concatenate([zfill, corr_a], 0)
    xcf = _silu(yc + bcf_ref[...].astype(f32))           # (H, CT, di)
    xcb = _silu(ya + bab_ref[...].astype(f32))
    return xcf, xcb


# ----------------------------------------------------------------------
# pass A: conv stage → materialized conv outputs + pools (default), or
# pools only (FASTVIM_LF_RECOMPUTE=1 — measured slower, kept opt-in)
# ----------------------------------------------------------------------

def _pass_a_even_kernel(xh_ref, prev_ref, next_ref, winx_ref, binx_ref,
                        wcf_ref, bcf_ref, wab_ref, bab_ref,
                        *out_refs,
                        RT, W, dm, di, scaling, nt, interpret):
    xcf, xcb = _conv_stage_even(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref, bcf_ref,
        wab_ref, bab_ref, out_refs[-1].dtype, RT=RT, W=W, dm=dm, di=di,
        nt=nt, interpret=interpret)
    xcf = xcf.reshape(RT, W, di)
    xcb = xcb.reshape(RT, W, di)
    pf_ref, pb_ref = out_refs[-2:]
    dt = pf_ref.dtype
    if len(out_refs) == 4:
        out_refs[0][0] = xcf.astype(dt)
        out_refs[1][0] = xcb.astype(dt)
    s = jnp.float32(scaling / W)
    pf_ref[0] = (jnp.sum(xcf, 1) * s).astype(dt)
    pb_ref[0] = (jnp.sum(xcb, 1) * s).astype(dt)


def _pass_a_odd_kernel(xh_ref, prev_ref, next_ref, winx_ref, binx_ref,
                       wcf_ref, bcf_ref, wab_ref, bab_ref,
                       *out_refs,
                       H, CT, dm, di, scaling, nt, interpret):
    xcf, xcb = _conv_stage_odd(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref, bcf_ref,
        wab_ref, bab_ref, out_refs[-1].dtype, H=H, CT=CT, dm=dm, di=di,
        nt=nt, interpret=interpret)
    pf_ref, pb_ref = out_refs[-2:]
    dt = pf_ref.dtype
    if len(out_refs) == 4:
        out_refs[0][0] = xcf.astype(dt)
        out_refs[1][0] = xcb.astype(dt)
    s = jnp.float32(scaling / H)
    pf_ref[0] = (jnp.sum(xcf, 0) * s).astype(dt)
    pb_ref[0] = (jnp.sum(xcb, 0) * s).astype(dt)


# ----------------------------------------------------------------------
# pass B: conv stage recompute + in_proj(z-half) + broadcast + D-skip +
# merge + LN + gate + out_proj
# ----------------------------------------------------------------------

def _merge_tail(xh_ref, yf, yb, xcf, xcb, winz_ref, binz_ref, df_ref,
                db_ref, lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                *, S0, S1, dm, di, eps, use_ln):
    """Broadcast+D-skip+merge+LN+gate+out_proj over one (S0, S1) token
    tile. yf/yb already broadcast-shaped (S0, S1 or 1-broadcastable,
    di); xcf/xcb are (S0, S1, di) fp32."""
    dt = out_ref.dtype
    T = S0 * S1
    z = jnp.dot(xh_ref[0].reshape(T, dm).astype(dt),
                winz_ref[...].astype(dt),
                preferred_element_type=jnp.float32)
    z = z + binz_ref[...].astype(jnp.float32)            # (T, di) f32
    df = df_ref[...].astype(jnp.float32)
    db = db_ref[...].astype(jnp.float32)
    m = (yf + df[None] * xcf + yb + db[None] * xcb) * jnp.float32(0.5)
    if use_ln:
        mu = jnp.mean(m, axis=-1, keepdims=True)
        var = jnp.mean(m * m, axis=-1, keepdims=True) - mu * mu
        m = (m - mu) * jax.lax.rsqrt(var + jnp.float32(eps))
        m = m * lnw_ref[...].astype(jnp.float32)[None] \
            + lnb_ref[...].astype(jnp.float32)[None]
    m = m.reshape(T, di) * (z * jax.nn.sigmoid(z))
    out = jnp.dot(m.astype(dt), wout_ref[...].astype(dt),
                  preferred_element_type=jnp.float32)
    out = out + bout_ref[...].astype(jnp.float32)
    out_ref[0] = out.astype(dt).reshape(S0, S1, dm)


def _pass_b_even_kernel(xh_ref, prev_ref, next_ref, yf_ref, yb_ref,
                        winx_ref, binx_ref, wcf_ref, bcf_ref, wab_ref,
                        bab_ref, winz_ref, binz_ref, df_ref, db_ref,
                        lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                        *, RT, W, dm, di, eps, use_ln, nt, interpret):
    dt = out_ref.dtype
    xcf, xcb = _conv_stage_even(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref, bcf_ref,
        wab_ref, bab_ref, dt, RT=RT, W=W, dm=dm, di=di, nt=nt,
        interpret=interpret)
    yf = yf_ref[0].astype(jnp.float32).reshape(RT, 1, di)
    yb = yb_ref[0].astype(jnp.float32).reshape(RT, 1, di)
    _merge_tail(xh_ref, yf, yb, xcf.reshape(RT, W, di),
                xcb.reshape(RT, W, di), winz_ref, binz_ref, df_ref,
                db_ref, lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                S0=RT, S1=W, dm=dm, di=di, eps=eps, use_ln=use_ln)


def _pass_b_odd_kernel(xh_ref, prev_ref, next_ref, yf_ref, yb_ref,
                       winx_ref, binx_ref, wcf_ref, bcf_ref, wab_ref,
                       bab_ref, winz_ref, binz_ref, df_ref, db_ref,
                       lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                       *, H, CT, dm, di, eps, use_ln, nt, interpret):
    dt = out_ref.dtype
    xcf, xcb = _conv_stage_odd(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref, bcf_ref,
        wab_ref, bab_ref, dt, H=H, CT=CT, dm=dm, di=di, nt=nt,
        interpret=interpret)
    yf = yf_ref[0].astype(jnp.float32).reshape(1, CT, di)
    yb = yb_ref[0].astype(jnp.float32).reshape(1, CT, di)
    _merge_tail(xh_ref, yf, yb, xcf, xcb, winz_ref, binz_ref, df_ref,
                db_ref, lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                S0=H, S1=CT, dm=dm, di=di, eps=eps, use_ln=use_ln)


def _pass_b_mat_kernel(xh_ref, xcf_ref, xcb_ref, yf_ref, yb_ref,
                       winz_ref, binz_ref, df_ref, db_ref, lnw_ref,
                       lnb_ref, wout_ref, bout_ref, out_ref,
                       *, S0, S1, dm, di, eps, use_ln, bcast_axis):
    """Default pass B: conv outputs materialized by pass A stream back
    in as pipelined blocks; only the merge tail runs here. Measured
    FASTER than the recompute variant (201 vs 136 img/s @2048 b2) —
    the fp32 conv rolls on the VPU cost more than the xc HBM round
    trip; the kernels are VPU-bound, not HBM-bound."""
    f32 = jnp.float32
    xcf = xcf_ref[0].astype(f32)                         # (S0, S1, di)
    xcb = xcb_ref[0].astype(f32)
    if bcast_axis == 1:
        yf = yf_ref[0].astype(f32).reshape(S0, 1, di)
        yb = yb_ref[0].astype(f32).reshape(S0, 1, di)
    else:
        yf = yf_ref[0].astype(f32).reshape(1, S1, di)
        yb = yb_ref[0].astype(f32).reshape(1, S1, di)
    _merge_tail(xh_ref, yf, yb, xcf, xcb, winz_ref, binz_ref, df_ref,
                db_ref, lnw_ref, lnb_ref, wout_ref, bout_ref, out_ref,
                S0=S0, S1=S1, dm=dm, di=di, eps=eps, use_ln=use_ln)


# ----------------------------------------------------------------------
# XLA mid-section + reference
# ----------------------------------------------------------------------

def _proj_scan(xp, x_proj_w, dt_w, dt_b, A_log, dtype, impl, reverse):
    """Identical to MambaMixer._proj_scan (models/mixer.py:200-216)."""
    from fastvim_tpu.ops import selective_scan

    dbl = jnp.dot(xp.astype(dtype), x_proj_w.astype(dtype))
    r = dt_w.shape[0]
    n = A_log.shape[1]
    dt = jnp.dot(dbl[..., :r], dt_w.astype(dtype))
    A = -jnp.exp(A_log.astype(jnp.float32))
    return selective_scan(xp.astype(dtype), dt, A, dbl[..., r:r + n],
                          dbl[..., r + n:], D=None, delta_bias=dt_b,
                          delta_softplus=True, impl=impl, reverse=reverse)


def _reference_core(x_hat, p, grid, transposed, scaling, eps, use_ln,
                    dtype, scan_impl):
    """Pure-JAX reference: exactly the mixer's XLA path for the dense
    pooled mean case (models/mixer.py:395-512). Used by the custom VJP
    (rematerialized backward) and the parity tests."""
    from fastvim_tpu.ops import layer_norm
    from fastvim_tpu.ops.conv import dual_conv1d, grid_dual_conv1d
    from fastvim_tpu.ops.scan import broadcast_grid, pool_grid

    (win, bin_, wcf, bcf, wab, bab, xpf, dtwf, dtbf, Af, Df,
     xpb, dtwb, dtbb, Ab, Db, lnw, lnb, wout, bout) = p
    di = wcf.shape[1]
    xz = jnp.dot(x_hat.astype(dtype), win.astype(dtype))
    if bin_ is not None:
        xz = xz + bin_.astype(dtype)
    xin, z = xz[..., :di], xz[..., di:]
    conv_args = (xin, wcf.astype(dtype),
                 None if bcf is None else bcf.astype(dtype),
                 wab.astype(dtype),
                 None if bab is None else bab.astype(dtype))
    if transposed:
        xc_f, xc_b = grid_dual_conv1d(*conv_args, tuple(grid), axis=0)
        pool_axes = (0,)
    else:
        xc_f, xc_b = dual_conv1d(*conv_args)
        pool_axes = (1,)
    pf = pool_grid(xc_f, grid, pool_axes, "mean", scaling)
    pb = pool_grid(xc_b, grid, pool_axes, "mean", scaling)
    yf = _proj_scan(pf, xpf, dtwf, dtbf, Af, dtype, scan_impl, False)
    yb = _proj_scan(pb, xpb, dtwb, dtbb, Ab, dtype, scan_impl, True)
    y_f = broadcast_grid(yf.astype(dtype), grid, pool_axes) \
        + Df.astype(dtype)[None, None] * xc_f
    y_b = broadcast_grid(yb.astype(dtype), grid, pool_axes) \
        + Db.astype(dtype)[None, None] * xc_b
    merged = (y_f + y_b) * jnp.asarray(0.5, dtype)
    if use_ln:
        merged = layer_norm(merged, lnw, lnb, eps=eps)
    merged = merged * jax.nn.silu(z)
    out = jnp.dot(merged.astype(dtype), wout.astype(dtype))
    if bout is not None:
        out = out + bout.astype(dtype)
    return out


# ----------------------------------------------------------------------
# fused forward
# ----------------------------------------------------------------------

def _zeros_or(v, shape):
    return jnp.zeros(shape, jnp.float32) if v is None else v


def _fused_fwd_impl(x_hat, p, grid, transposed, scaling, eps, use_ln,
                    dtype, scan_impl, interpret):
    (win, bin_, wcf, bcf, wab, bab, xpf, dtwf, dtbf, Af, Df,
     xpb, dtwb, dtbb, Ab, Db, lnw, lnb, wout, bout) = p
    B, L, dm = x_hat.shape
    H, W = grid
    di = wcf.shape[1]
    assert L == H * W, (L, grid)
    x4 = x_hat.reshape(B, H, W, dm).astype(dtype)
    winx, winz = win[:, :di], win[:, di:]
    binx = _zeros_or(None if bin_ is None else bin_[:di], (di,))[None]
    binz = _zeros_or(None if bin_ is None else bin_[di:], (di,))[None]
    bcf_ = _zeros_or(bcf, (di,))[None]
    bab_ = _zeros_or(bab, (di,))[None]
    lnw_ = _zeros_or(lnw if use_ln else None, (di,))[None]
    lnb_ = _zeros_or(lnb if use_ln else None, (di,))[None]
    bout_ = _zeros_or(bout, (dm,))[None]

    vec_di = pl.BlockSpec((1, di), lambda b, i: (0, 0))
    vec_dm = pl.BlockSpec((1, dm), lambda b, i: (0, 0))
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b, i: (0, 0))
    conv_w = pl.BlockSpec((PAD + 1, di), lambda b, i: (0, 0))
    # opt-in recompute mode: pass A writes only the pooled arrays and
    # pass B re-runs the x-half GEMM + conv (≈4× fewer HBM bytes) —
    # measured SLOWER (136 vs 201 img/s @2048 b2): the kernels are
    # VPU-bound on the fp32 conv rolls, not HBM-bound
    recompute = os.environ.get("FASTVIM_LF_RECOMPUTE", "0") == "1"

    if not transposed:
        RT = int(os.environ.get("FASTVIM_LF_TILE", "0")) or \
            _pick_tile(H, W, di)
        assert H % RT == 0
        nt = H // RT
        xh_spec = pl.BlockSpec((1, RT, W, dm), lambda b, i: (b, i, 0, 0))
        prev_spec = pl.BlockSpec(
            (1, 1, W, dm),
            lambda b, i: (b, jnp.maximum(i * RT - 1, 0), 0, 0))
        next_spec = pl.BlockSpec(
            (1, 1, W, dm),
            lambda b, i: (b, jnp.minimum((i + 1) * RT, H - 1), 0, 0))
        xc_spec = pl.BlockSpec((1, RT, W, di), lambda b, i: (b, i, 0, 0))
        pool_spec = pl.BlockSpec((1, RT, di), lambda b, i: (b, i, 0))
        P = H
        kern_a = functools.partial(_pass_a_even_kernel, RT=RT, W=W,
                                   dm=dm, di=di, scaling=scaling, nt=nt,
                                   interpret=interpret)
        if recompute:
            kern_b = functools.partial(_pass_b_even_kernel, RT=RT, W=W,
                                       dm=dm, di=di, eps=eps,
                                       use_ln=use_ln, nt=nt,
                                       interpret=interpret)
        else:
            kern_b = functools.partial(_pass_b_mat_kernel, S0=RT, S1=W,
                                       dm=dm, di=di, eps=eps,
                                       use_ln=use_ln, bcast_axis=1)
        grid_a = (B, nt)
    else:
        CT = int(os.environ.get("FASTVIM_LF_TILE", "0")) or \
            _pick_tile(W, H, di)
        assert W % CT == 0
        nt = W // CT
        xh_spec = pl.BlockSpec((1, H, CT, dm), lambda b, j: (b, 0, j, 0))
        prev_spec = pl.BlockSpec(
            (1, H, CT, dm),
            lambda b, j: (b, 0, jnp.maximum(j - 1, 0), 0))
        next_spec = pl.BlockSpec(
            (1, H, CT, dm),
            lambda b, j: (b, 0, jnp.minimum(j + 1, nt - 1), 0))
        xc_spec = pl.BlockSpec((1, H, CT, di), lambda b, j: (b, 0, j, 0))
        pool_spec = pl.BlockSpec((1, CT, di), lambda b, j: (b, j, 0))
        P = W
        kern_a = functools.partial(_pass_a_odd_kernel, H=H, CT=CT, dm=dm,
                                   di=di, scaling=scaling, nt=nt,
                                   interpret=interpret)
        if recompute:
            kern_b = functools.partial(_pass_b_odd_kernel, H=H, CT=CT,
                                       dm=dm, di=di, eps=eps,
                                       use_ln=use_ln, nt=nt,
                                       interpret=interpret)
        else:
            kern_b = functools.partial(_pass_b_mat_kernel, S0=H, S1=CT,
                                       dm=dm, di=di, eps=eps,
                                       use_ln=use_ln, bcast_axis=0)
        grid_a = (B, nt)

    tile_tokens = (RT * W) if not transposed else (H * CT)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_limit(tile_tokens, di))
    pool_shape = jax.ShapeDtypeStruct((B, P, di), dtype)
    xc_shape = jax.ShapeDtypeStruct((B, H, W, di), dtype)
    a_out_specs = [pool_spec, pool_spec] if recompute else \
        [xc_spec, xc_spec, pool_spec, pool_spec]
    a_out_shape = [pool_shape, pool_shape] if recompute else \
        [xc_shape, xc_shape, pool_shape, pool_shape]
    a_out = pl.pallas_call(
        kern_a,
        grid=grid_a,
        in_specs=[xh_spec, prev_spec, next_spec, mat(dm, di), vec_di,
                  conv_w, vec_di, conv_w, vec_di],
        out_specs=a_out_specs,
        out_shape=a_out_shape,
        compiler_params=cparams,
        interpret=interpret,
    )(x4, x4, x4, winx, binx, wcf, bcf_, wab, bab_)
    pf, pb = a_out[-2:]

    yf = _proj_scan(pf, xpf, dtwf, dtbf, Af, dtype, scan_impl, False)
    yb = _proj_scan(pb, xpb, dtwb, dtbb, Ab, dtype, scan_impl, True)
    yf = yf.astype(dtype)
    yb = yb.astype(dtype)

    if recompute:
        b_in_specs = [xh_spec, prev_spec, next_spec, pool_spec,
                      pool_spec, mat(dm, di), vec_di, conv_w, vec_di,
                      conv_w, vec_di, mat(dm, di), vec_di, vec_di,
                      vec_di, vec_di, vec_di, mat(di, dm), vec_dm]
        b_args = (x4, x4, x4, yf, yb, winx, binx, wcf, bcf_, wab, bab_,
                  winz, binz, Df[None], Db[None], lnw_, lnb_, wout,
                  bout_)
    else:
        xc_f, xc_b = a_out[0], a_out[1]
        b_in_specs = [xh_spec, xc_spec, xc_spec, pool_spec, pool_spec,
                      mat(dm, di), vec_di, vec_di, vec_di, vec_di,
                      vec_di, mat(di, dm), vec_dm]
        b_args = (x4, xc_f, xc_b, yf, yb, winz, binz, Df[None],
                  Db[None], lnw_, lnb_, wout, bout_)

    out = pl.pallas_call(
        kern_b,
        grid=grid_a,
        in_specs=b_in_specs,
        out_specs=xh_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, dm), dtype),
        compiler_params=cparams,
        interpret=interpret,
    )(*b_args)
    return out.reshape(B, L, dm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7,
                                                    8, 9))
def fused_mixer_core(x_hat, p, grid, transposed, scaling, eps, use_ln,
                     dtype, scan_impl, interpret):
    """Fused FastVim mixer layer (in_proj → … → out_proj).

    x_hat: (B, L, d_model) normed block input. p: parameter tuple (see
    `_reference_core`). Returns (B, L, d_model). Gradient: jax.vjp of
    the pure-JAX reference (rematerialized)."""
    return _fused_fwd_impl(x_hat, p, grid, transposed, scaling, eps,
                           use_ln, dtype, scan_impl, interpret)


def _fmc_fwd(x_hat, p, grid, transposed, scaling, eps, use_ln, dtype,
             scan_impl, interpret):
    out = _fused_fwd_impl(x_hat, p, grid, transposed, scaling, eps,
                          use_ln, dtype, scan_impl, interpret)
    return out, (x_hat, p)


def _fmc_bwd(grid, transposed, scaling, eps, use_ln, dtype, scan_impl,
             interpret, res, g):
    x_hat, p = res
    _, vjp = jax.vjp(
        lambda xh, pp: _reference_core(xh, pp, grid, transposed, scaling,
                                       eps, use_ln, dtype, scan_impl),
        x_hat, p)
    return vjp(g)


fused_mixer_core.defvjp(_fmc_fwd, _fmc_bwd)
