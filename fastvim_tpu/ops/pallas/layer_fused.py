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

Backward: custom VJP with fused adjoint kernels (pass B then pass A
mirrored, FASTVIM_LF_BWD=fused default) or jax.vjp of the pure-JAX
reference (`_reference_core`, exactly the mixer's XLA math) as the
rematerializing fallback (FASTVIM_LF_BWD=remat; always used in the
recompute forward mode, which saves no conv outputs).

Multi-device: pallas_call has no GSPMD partitioning rule, so under a
multi-device jit the call is wrapped in a data-axis shard_map
(``fused_mixer_core_sharded``; dispatch in ``should_use_fused``).

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
    see ops/pallas/fused_block.py).

    Measured NEUTRAL alternatives @2048 b2 (docs/PERF.md §6): exp2
    (exp(-v)=exp2(-v·log2e)) — exactly equal in an interleaved A/B;
    bf16 exp (FASTVIM_LF_SILU_BF16=1) — equal within the ±6%
    cross-process drift band. jnp.exp kept for simplicity."""
    if os.environ.get("FASTVIM_LF_NOSILU") == "1":  # timing probe ONLY
        return v * jnp.float32(0.25)
    if os.environ.get("FASTVIM_LF_SILU_BF16") == "1":
        vh = v.astype(jnp.bfloat16)
        sh = vh / (jnp.ones_like(vh) + jnp.exp(-vh))
        return sh.astype(v.dtype)
    if os.environ.get("FASTVIM_LF_SILU_NATIVE") == "1":
        # fp32 jax.nn.silu (logistic HLO) — the bf16 Mosaic
        # vector.broadcast bug does not apply to fp32 operands
        return jax.nn.silu(v)
    if os.environ.get("FASTVIM_LF_SILU_TANH") == "1":
        # exact tanh form: sigmoid(v) = ½(1+tanh(v/2)) — trades the
        # VPU divide for a multiply if Mosaic lowers tanh natively
        half = jnp.full_like(v, 0.5)
        return v * (half + half * jnp.tanh(v * half))
    return v / (jnp.ones_like(v) + jnp.exp(-v))


def _roll(x, shift, axis, interpret):
    if shift == 0:
        return x
    if os.environ.get("FASTVIM_LF_NOROLL") == "1":  # timing probe ONLY
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
    if os.environ.get("FASTVIM_LF_NOCONV") == "1":  # timing probe ONLY
        yc = xin + bcf_ref[...].astype(f32)
        ya = xin + bab_ref[...].astype(f32)
        xcf = _silu(yc)
        xcb = _silu(ya)
        return xcf, xcb, yc, ya, xin, prev_row, next_row
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
    yc = yc + jnp.concatenate([corr_c, zfill], 0) \
        + bcf_ref[...].astype(f32)
    ya = ya + jnp.concatenate([zfill, corr_a], 0) \
        + bab_ref[...].astype(f32)
    xcf = _silu(yc)                                      # (T, di) f32
    xcb = _silu(ya)
    return xcf, xcb, yc, ya, xin, prev_row, next_row


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
    if os.environ.get("FASTVIM_LF_NOCONV") == "1":  # timing probe ONLY
        yc = xin + bcf_ref[...].astype(f32)
        ya = xin + bab_ref[...].astype(f32)
        xcf = _silu(yc)
        xcb = _silu(ya)
        return xcf, xcb, yc, ya, xin, prev_col, next_col
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
    yc = yc + jnp.concatenate([corr_c, zfill], 0) \
        + bcf_ref[...].astype(f32)
    ya = ya + jnp.concatenate([zfill, corr_a], 0) \
        + bab_ref[...].astype(f32)
    xcf = _silu(yc)                                      # (H, CT, di)
    xcb = _silu(ya)
    return xcf, xcb, yc, ya, xin, prev_col, next_col


# ----------------------------------------------------------------------
# pass A: conv stage → materialized conv outputs + pools (default), or
# pools only (FASTVIM_LF_RECOMPUTE=1 — measured slower, kept opt-in)
# ----------------------------------------------------------------------

def _pass_a_even_kernel(xh_ref, prev_ref, next_ref, winx_ref, binx_ref,
                        wcf_ref, bcf_ref, wab_ref, bab_ref,
                        *out_refs,
                        RT, W, dm, di, scaling, nt, interpret):
    xcf, xcb, *_ = _conv_stage_even(
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
    xcf, xcb, *_ = _conv_stage_odd(
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
    m = m.reshape(T, di) * _silu(z)
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
    xcf, xcb, *_ = _conv_stage_even(
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
    xcf, xcb, *_ = _conv_stage_odd(
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
# fused backward (FASTVIM_LF_BWD=fused): adjoint kernels mirroring the
# forward tiles; the pooled scans' VJP runs in XLA between them.
# Cross-tile conv-adjoint terms arrive as halo READS (the adjoint of
# "my boundary outputs consumed the neighbour's values" is "my boundary
# inputs receive from the neighbour's cotangents"), so no tile ever
# writes outside its own blocks. Weight grads accumulate into
# constant-index output blocks revisited across the sequential grid.
# ----------------------------------------------------------------------


def _dsilu(v):
    """d/dv [v·sigmoid(v)] with all-vector operands."""
    s = jnp.ones_like(v) / (jnp.ones_like(v) + jnp.exp(-v))
    return s * (jnp.ones_like(v) + v * (jnp.ones_like(v) - s))


def _acc(ref, contrib, first):
    ref[...] = jnp.where(first, contrib, ref[...] + contrib)


def _pass_b_bwd_kernel(g_ref, xh_ref, xcf_ref, xcb_ref, yf_ref, yb_ref,
                       winz_ref, binz_ref, df_ref, db_ref, lnw_ref,
                       lnb_ref, wout_ref,
                       dxh_ref, dxcf_ref, dxcb_ref, dyf_ref, dyb_ref,
                       dwout_ref, dbout_ref, dwinz_ref, dbinz_ref,
                       dlnw_ref, dlnb_ref, ddf_ref, ddb_ref,
                       *, S0, S1, dm, di, eps, use_ln, bcast_axis):
    """Adjoint of pass B over one (S0, S1) token tile: out_proj GEMM,
    gate, LN, merge, D-skip, broadcast — recomputes z/m0/LN stats from
    the saved forward tensors (x̂, xc, pooled y)."""
    f32 = jnp.float32
    dt = xh_ref.dtype
    T = S0 * S1
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    xh = xh_ref[0].reshape(T, dm)
    z = jnp.dot(xh.astype(dt), winz_ref[...].astype(dt),
                preferred_element_type=f32)
    z = z + binz_ref[...].astype(f32)                     # (T, di)
    sz = _silu(z)
    xcf = xcf_ref[0].astype(f32)                          # (S0, S1, di)
    xcb = xcb_ref[0].astype(f32)
    df = df_ref[...].astype(f32)
    db = db_ref[...].astype(f32)
    if bcast_axis == 1:
        yf = yf_ref[0].astype(f32).reshape(S0, 1, di)
        yb = yb_ref[0].astype(f32).reshape(S0, 1, di)
    else:
        yf = yf_ref[0].astype(f32).reshape(1, S1, di)
        yb = yb_ref[0].astype(f32).reshape(1, S1, di)
    m0 = ((yf + df[None] * xcf + yb + db[None] * xcb)
          * f32(0.5)).reshape(T, di)

    g = g_ref[0].reshape(T, dm).astype(f32)
    # dm_gated = g · wout^T  (contract dm with dm — no transpose
    # materialization)
    dm_gated = jax.lax.dot_general(
        g.astype(dt), wout_ref[...].astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=f32)

    if use_ln:
        mu = jnp.mean(m0, axis=-1, keepdims=True)
        var = jnp.mean(m0 * m0, axis=-1, keepdims=True) - mu * mu
        rstd = jax.lax.rsqrt(var + f32(eps))
        mhat = (m0 - mu) * rstd
        lnw = lnw_ref[...].astype(f32)
        mln = mhat * lnw + lnb_ref[...].astype(f32)
    else:
        mhat = m0
        mln = m0

    dmln = dm_gated * sz
    dz = dm_gated * mln * _dsilu(z)

    # out_proj weight grads: dwout = (mln·sz)^T · g
    mg = (mln * sz).astype(dt)
    _acc(dwout_ref, jax.lax.dot_general(
        mg, g.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32), first)
    _acc(dbout_ref, jnp.sum(g, 0, keepdims=True), first)

    if use_ln:
        _acc(dlnw_ref, jnp.sum(dmln * mhat, 0, keepdims=True), first)
        _acc(dlnb_ref, jnp.sum(dmln, 0, keepdims=True), first)
        dmhat = dmln * lnw
        dm0 = rstd * (dmhat
                      - jnp.mean(dmhat, axis=-1, keepdims=True)
                      - mhat * jnp.mean(dmhat * mhat, axis=-1,
                                        keepdims=True))
    else:
        # keep the accumulator outputs defined even when LN is off
        zrow = jnp.zeros((1, di), f32)
        _acc(dlnw_ref, zrow, first)
        _acc(dlnb_ref, zrow, first)
        dm0 = dmln

    # z-half GEMM adjoints
    _acc(dwinz_ref, jax.lax.dot_general(
        xh.astype(dt), dz.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32), first)
    _acc(dbinz_ref, jnp.sum(dz, 0, keepdims=True), first)
    dxh = jax.lax.dot_general(
        dz.astype(dt), winz_ref[...].astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dxh_ref[0] = dxh.astype(dxh_ref.dtype).reshape(S0, S1, dm)

    # merge / D-skip / broadcast adjoints
    dm0h = (dm0 * f32(0.5)).reshape(S0, S1, di)
    dxcf = dm0h * df[None]
    dxcb = dm0h * db[None]
    _acc(ddf_ref, jnp.sum((dm0h * xcf).reshape(T, di), 0,
                          keepdims=True), first)
    _acc(ddb_ref, jnp.sum((dm0h * xcb).reshape(T, di), 0,
                          keepdims=True), first)
    dxcf_ref[0] = dxcf.astype(dxcf_ref.dtype)
    dxcb_ref[0] = dxcb.astype(dxcb_ref.dtype)
    # yf and yb enter the merge symmetrically → identical cotangents
    dy = jnp.sum(dm0h, bcast_axis)
    dyf_ref[0] = dy.astype(dyf_ref.dtype)
    dyb_ref[0] = dy.astype(dyb_ref.dtype)


def _pass_a_bwd_even_kernel(
        xh_ref, prev_ref, next_ref, dxh_b_ref, dxcf_ref, dxcb_ref,
        dxcf_next_ref, dxcb_prev_ref, dpf_ref, dpb_ref, dpf_next_ref,
        dpb_prev_ref, winx_ref, binx_ref, wcf_ref, bcf_ref, wab_ref,
        bab_ref,
        dxh_ref, dwinx_ref, dbinx_ref, dwcf_ref, dbcf_ref, dwab_ref,
        dbab_ref,
        *, RT, W, dm, di, scaling, nt, interpret):
    """Adjoint of pass A (even orientation): mean-pool bwd, silu bwd on
    recomputed pre-activations, dual-conv adjoint (cross-tile terms as
    halo reads of the NEIGHBOUR's cotangents), x-half GEMM adjoint.
    Accumulates dwinx/dbinx/dwcf/dbcf/dwab/dbab across the grid."""
    i = pl.program_id(1)
    f32 = jnp.float32
    dt = xh_ref.dtype
    T = RT * W
    first = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    _, _, yc, ya, xin, prev_row, next_row = _conv_stage_even(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref,
        bcf_ref, wab_ref, bab_ref, dt, RT=RT, W=W, dm=dm, di=di, nt=nt,
        interpret=interpret)
    wc = wcf_ref[...].astype(f32)
    wa = wab_ref[...].astype(f32)
    bcf = bcf_ref[...].astype(f32)
    bab = bab_ref[...].astype(f32)
    tail_true = prev_row[W - PAD:]                       # (3, di)
    head_true = next_row[:PAD]

    # pool backward (mean with scaling): one pooled cotangent per row
    sw = f32(scaling / W)
    dpf = dpf_ref[0].astype(f32)                         # (RT, di)
    dpb = dpb_ref[0].astype(f32)
    Dxcf = dxcf_ref[0].astype(f32) + dpf[:, None] * sw   # (RT, W, di)
    Dxcb = dxcb_ref[0].astype(f32) + dpb[:, None] * sw
    dyc = Dxcf.reshape(T, di) * _dsilu(yc)               # (T, di)
    dya = Dxcb.reshape(T, di) * _dsilu(ya)
    _acc(dbcf_ref, jnp.sum(dyc, 0, keepdims=True), first)
    _acc(dbab_ref, jnp.sum(dya, 0, keepdims=True), first)

    # halo cotangents: the NEXT tile's first 3 causal outputs and the
    # PREV tile's last 3 anticausal outputs consumed my boundary inputs
    keep_n = (i < nt - 1)
    keep_p = (i > 0)
    dxcf_n3 = dxcf_next_ref[0, 0, :PAD].astype(f32)      # (3, di)
    dpf_n = dpf_next_ref[0, 0:1].astype(f32)             # (1, di)
    Dxcf_n3 = dxcf_n3 + dpf_n * sw
    cat6c = jnp.concatenate([xin[T - PAD:], head_true], 0)   # (6, di)
    yc_n3 = bcf * jnp.ones((PAD, di), f32)
    for k in range(PAD + 1):
        yc_n3 = yc_n3 + cat6c[k:k + PAD] * wc[k][None]
    dyc_n3 = Dxcf_n3 * _dsilu(yc_n3) * keep_n.astype(f32)

    dxcb_p3 = dxcb_prev_ref[0, 0, W - PAD:].astype(f32)  # (3, di)
    dpb_p = dpb_prev_ref[0, RT - 1:RT].astype(f32)       # (1, di)
    Dxcb_p3 = dxcb_p3 + dpb_p * sw
    cat6a = jnp.concatenate([tail_true, xin[:PAD]], 0)   # (6, di)
    ya_p3 = bab * jnp.ones((PAD, di), f32)
    for k in range(PAD + 1):
        ya_p3 = ya_p3 + cat6a[k:k + PAD] * wa[PAD - k][None]
    dya_p3 = Dxcb_p3 * _dsilu(ya_p3) * keep_p.astype(f32)

    # conv adjoint: dxin[t] = Σ_k wc[k]·dyc_ext[t+(PAD-k)]
    #                       + Σ_k wa[PAD-k]·dya_ext[t-k]
    dxin = None
    for k in range(PAD + 1):
        s = PAD - k
        if s == 0:
            rc = dyc
        else:
            rc = jnp.concatenate(
                [_roll(dyc, -s, 0, interpret)[:T - s], dyc_n3[:s]], 0)
        term = rc * wc[k][None]
        if k == 0:
            ra = dya
        else:
            ra = jnp.concatenate([dya_p3[PAD - k:], dya[:T - k]], 0)
        term = term + ra * wa[PAD - k][None]
        dxin = term if dxin is None else dxin + term

    # conv weight grads: Σ_t (corrected shifted input)·cotangent
    dwc_rows = []
    dwa_rows = [None] * (PAD + 1)
    for k in range(PAD + 1):
        s = PAD - k
        base = jnp.sum(_roll(xin, s, 0, interpret) * dyc, 0,
                       keepdims=True)
        if s:
            base = base + jnp.sum(
                (tail_true[PAD - s:] - xin[T - s:]) * dyc[:s], 0,
                keepdims=True)
        dwc_rows.append(base)
        base_a = jnp.sum(_roll(xin, -k, 0, interpret) * dya, 0,
                         keepdims=True)
        if k:
            base_a = base_a + jnp.sum(
                (head_true[:k] - xin[:k]) * dya[T - k:], 0,
                keepdims=True)
        dwa_rows[PAD - k] = base_a
    _acc(dwcf_ref, jnp.concatenate(dwc_rows, 0), first)
    _acc(dwab_ref, jnp.concatenate(dwa_rows, 0), first)

    # x-half GEMM adjoint
    xh = xh_ref[0].reshape(T, dm)
    _acc(dwinx_ref, jax.lax.dot_general(
        xh.astype(dt), dxin.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32), first)
    _acc(dbinx_ref, jnp.sum(dxin, 0, keepdims=True), first)
    dxh = dxh_b_ref[0].reshape(T, dm).astype(f32) + jax.lax.dot_general(
        dxin.astype(dt), winx_ref[...].astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dxh_ref[0] = dxh.astype(dxh_ref.dtype).reshape(RT, W, dm)


def _pass_a_bwd_odd_kernel(
        xh_ref, prev_ref, next_ref, dxh_b_ref, dxcf_ref, dxcb_ref,
        dxcf_next_ref, dxcb_prev_ref, dpf_ref, dpb_ref, dpf_next_ref,
        dpb_prev_ref, winx_ref, binx_ref, wcf_ref, bcf_ref, wab_ref,
        bab_ref,
        dxh_ref, dwinx_ref, dbinx_ref, dwcf_ref, dbcf_ref, dwab_ref,
        dbab_ref,
        *, H, CT, dm, di, scaling, nt, interpret):
    """Adjoint of pass A (odd/transposed orientation): conv adjoint
    along the leading H axis with cross-column wrap — in-tile column
    shifts mirror the forward's head/tail_true construction; cross-tile
    terms read the neighbour tile's first/last column cotangents."""
    j = pl.program_id(1)
    f32 = jnp.float32
    dt = xh_ref.dtype
    first = jnp.logical_and(pl.program_id(0) == 0, j == 0)

    _, _, yc, ya, xin, prev_col, next_col = _conv_stage_odd(
        xh_ref, prev_ref, next_ref, winx_ref, binx_ref, wcf_ref,
        bcf_ref, wab_ref, bab_ref, dt, H=H, CT=CT, dm=dm, di=di, nt=nt,
        interpret=interpret)
    wc = wcf_ref[...].astype(f32)
    wa = wab_ref[...].astype(f32)
    bcf = bcf_ref[...].astype(f32)
    bab = bab_ref[...].astype(f32)
    # true boundary inputs, as the forward builds them
    tail_self = xin[H - PAD:]                            # (3, CT, di)
    head_self = xin[:PAD]
    tail_true = jnp.concatenate(
        [prev_col[H - PAD:].reshape(PAD, 1, di), tail_self[:, :CT - 1]],
        1)
    head_true = jnp.concatenate(
        [head_self[:, 1:], next_col[:PAD].reshape(PAD, 1, di)], 1)

    sh = f32(scaling / H)
    dpf = dpf_ref[0].astype(f32)                         # (CT, di)
    dpb = dpb_ref[0].astype(f32)
    Dxcf = dxcf_ref[0].astype(f32) + dpf[None] * sh      # (H, CT, di)
    Dxcb = dxcb_ref[0].astype(f32) + dpb[None] * sh
    dyc = Dxcf * _dsilu(yc)                              # (H, CT, di)
    dya = Dxcb * _dsilu(ya)
    T = H * CT
    _acc(dbcf_ref, jnp.sum(dyc.reshape(T, di), 0, keepdims=True), first)
    _acc(dbab_ref, jnp.sum(dya.reshape(T, di), 0, keepdims=True), first)

    # halo cotangents at the neighbouring TILES' boundary columns
    keep_n = (j < nt - 1)
    keep_p = (j > 0)
    dxcf_n3 = dxcf_next_ref[0, :PAD, 0:1, :].reshape(PAD, di) \
        .astype(f32)
    dpf_n = dpf_next_ref[0, 0:1].astype(f32)             # (1, di)
    Dxcf_n3 = dxcf_n3 + dpf_n * sh
    my_tail = xin[H - PAD:, CT - 1:CT, :].reshape(PAD, di)
    cat6c = jnp.concatenate([my_tail, next_col[:PAD]], 0)
    yc_n3 = bcf * jnp.ones((PAD, di), f32)
    for k in range(PAD + 1):
        yc_n3 = yc_n3 + cat6c[k:k + PAD] * wc[k][None]
    dyc_n3 = Dxcf_n3 * _dsilu(yc_n3) * keep_n.astype(f32)

    dxcb_p3 = dxcb_prev_ref[0, H - PAD:, CT - 1:CT, :] \
        .reshape(PAD, di).astype(f32)
    dpb_p = dpb_prev_ref[0, CT - 1:CT].astype(f32)
    Dxcb_p3 = dxcb_p3 + dpb_p * sh
    my_head = xin[:PAD, 0:1, :].reshape(PAD, di)
    cat6a = jnp.concatenate([prev_col[H - PAD:], my_head], 0)
    ya_p3 = bab * jnp.ones((PAD, di), f32)
    for k in range(PAD + 1):
        ya_p3 = ya_p3 + cat6a[k:k + PAD] * wa[PAD - k][None]
    dya_p3 = Dxcb_p3 * _dsilu(ya_p3) * keep_p.astype(f32)

    # cotangent boundary lines shifted one column, mirroring head/tail
    # _true in the forward: my column col's overflow outputs live in
    # column col+1's head (causal) / col-1's tail (anticausal)
    next_head = jnp.concatenate(
        [dyc[:PAD, 1:], dyc_n3.reshape(PAD, 1, di)], 1)  # (3, CT, di)
    prev_tail = jnp.concatenate(
        [dya_p3.reshape(PAD, 1, di), dya[H - PAD:, :CT - 1]], 1)

    dxin = None
    for k in range(PAD + 1):
        s = PAD - k
        if s == 0:
            rc = dyc
        else:
            rc = jnp.concatenate(
                [_roll(dyc, -s, 0, interpret)[:H - s], next_head[:s]],
                0)
        term = rc * wc[k][None, None]
        if k == 0:
            ra = dya
        else:
            ra = jnp.concatenate([prev_tail[PAD - k:], dya[:H - k]], 0)
        term = term + ra * wa[PAD - k][None, None]
        dxin = term if dxin is None else dxin + term

    dwc_rows = []
    dwa_rows = [None] * (PAD + 1)
    for k in range(PAD + 1):
        s = PAD - k
        base = jnp.sum((_roll(xin, s, 0, interpret)
                        * dyc).reshape(T, di), 0, keepdims=True)
        if s:
            base = base + jnp.sum(
                ((tail_true[PAD - s:] - xin[H - s:])
                 * dyc[:s]).reshape(s * CT, di), 0, keepdims=True)
        dwc_rows.append(base)
        base_a = jnp.sum((_roll(xin, -k, 0, interpret)
                          * dya).reshape(T, di), 0, keepdims=True)
        if k:
            base_a = base_a + jnp.sum(
                ((head_true[:k] - xin[:k])
                 * dya[H - k:]).reshape(k * CT, di), 0, keepdims=True)
        dwa_rows[PAD - k] = base_a
    _acc(dwcf_ref, jnp.concatenate(dwc_rows, 0), first)
    _acc(dwab_ref, jnp.concatenate(dwa_rows, 0), first)

    xh = xh_ref[0].reshape(T, dm)
    dxin_f = dxin.reshape(T, di)
    _acc(dwinx_ref, jax.lax.dot_general(
        xh.astype(dt), dxin_f.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=f32), first)
    _acc(dbinx_ref, jnp.sum(dxin_f, 0, keepdims=True), first)
    dxh = dxh_b_ref[0].reshape(T, dm).astype(f32) + jax.lax.dot_general(
        dxin_f.astype(dt), winx_ref[...].astype(dt),
        (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dxh_ref[0] = dxh.astype(dxh_ref.dtype).reshape(H, CT, dm)


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


def _proj_scan_paired(pf, pb, s, dtype):
    """Both pooled-direction scans in ONE forward associative scan
    (mirrors MambaMixer._paired_proj_scan, models/mixer.py:238-270):
    the reverse branch's pooled inputs are flipped (P≈rows — tiny at
    pooled length, unlike the measured-negative full-L variant), the
    directions are concatenated on the channel axis with grouped B/C.
    In the fused dispatch the scans are NOT latency-hidden (the
    pass A → scan → pass B chain serializes; NOSCAN probe: 1.0 ms of
    the 9.8 ms step @2048 b2), so halving the scan dispatches pays
    where the XLA-path experiment lost."""
    from fastvim_tpu.ops import selective_scan

    r = s["dtwf"].shape[0]
    n = s["Af"].shape[1]

    def proj(xp, xw, dtw):
        dbl = jnp.dot(xp.astype(dtype), xw.astype(dtype))
        dt = jnp.dot(dbl[..., :r], dtw.astype(dtype))
        return dt, dbl[..., r:r + n], dbl[..., r + n:]

    dt_f, B_f, C_f = proj(pf, s["xpf"], s["dtwf"])
    dt_b, B_b, C_b = proj(pb, s["xpb"], s["dtwb"])
    flip = lambda t: t[:, ::-1]
    u = jnp.concatenate([pf.astype(dtype), flip(pb.astype(dtype))], -1)
    dt = jnp.concatenate([dt_f, flip(dt_b)], -1)
    Bc = jnp.stack([B_f, flip(B_b)], 2)                 # (B, P, 2, n)
    Cc = jnp.stack([C_f, flip(C_b)], 2)
    A = -jnp.exp(jnp.concatenate(
        [s["Af"], s["Ab"]]).astype(jnp.float32))        # (2·di, n)
    db = jnp.concatenate([s["dtbf"], s["dtbb"]])
    y = selective_scan(u, dt, A, Bc, Cc, D=None, delta_bias=db,
                       delta_softplus=True, impl="assoc")
    di = pf.shape[-1]
    return y[..., :di], flip(y[..., di:])


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


class _Tiling:
    """Block specs shared by the forward and backward pallas calls."""

    def __init__(self, grid, transposed, di, dm):
        H, W = grid
        self.vec_di = pl.BlockSpec((1, di), lambda b, i: (0, 0))
        self.vec_dm = pl.BlockSpec((1, dm), lambda b, i: (0, 0))
        self.mat = lambda r, c: pl.BlockSpec((r, c), lambda b, i: (0, 0))
        self.conv_w = pl.BlockSpec((PAD + 1, di), lambda b, i: (0, 0))
        tile_env = int(os.environ.get("FASTVIM_LF_TILE", "0"))
        if not transposed:
            RT = tile_env or _pick_tile(H, W, di)
            assert H % RT == 0
            self.tile, self.nt = RT, H // RT
            nt = self.nt
            self.xh = pl.BlockSpec((1, RT, W, dm),
                                   lambda b, i: (b, i, 0, 0))
            self.prev = pl.BlockSpec(
                (1, 1, W, dm),
                lambda b, i: (b, jnp.maximum(i * RT - 1, 0), 0, 0))
            self.next = pl.BlockSpec(
                (1, 1, W, dm),
                lambda b, i: (b, jnp.minimum((i + 1) * RT, H - 1), 0, 0))
            self.xc = pl.BlockSpec((1, RT, W, di),
                                   lambda b, i: (b, i, 0, 0))
            # one-row halos of a full-length (B, H, W, di) cotangent
            self.xc_next = pl.BlockSpec(
                (1, 1, W, di),
                lambda b, i: (b, jnp.minimum((i + 1) * RT, H - 1), 0, 0))
            self.xc_prev = pl.BlockSpec(
                (1, 1, W, di),
                lambda b, i: (b, jnp.maximum(i * RT - 1, 0), 0, 0))
            self.pool = pl.BlockSpec((1, RT, di), lambda b, i: (b, i, 0))
            self.pool_next = pl.BlockSpec(
                (1, RT, di), lambda b, i: (b, jnp.minimum(i + 1, nt - 1),
                                           0))
            self.pool_prev = pl.BlockSpec(
                (1, RT, di), lambda b, i: (b, jnp.maximum(i - 1, 0), 0))
            self.P = H
            self.tile_tokens = RT * W
        else:
            CT = tile_env or _pick_tile(W, H, di)
            assert W % CT == 0
            self.tile, self.nt = CT, W // CT
            nt = self.nt
            self.xh = pl.BlockSpec((1, H, CT, dm),
                                   lambda b, j: (b, 0, j, 0))
            self.prev = pl.BlockSpec(
                (1, H, CT, dm),
                lambda b, j: (b, 0, jnp.maximum(j - 1, 0), 0))
            self.next = pl.BlockSpec(
                (1, H, CT, dm),
                lambda b, j: (b, 0, jnp.minimum(j + 1, nt - 1), 0))
            self.xc = pl.BlockSpec((1, H, CT, di),
                                   lambda b, j: (b, 0, j, 0))
            # full neighbour column-tiles (Mosaic 8/128 block rule)
            self.xc_next = pl.BlockSpec(
                (1, H, CT, di),
                lambda b, j: (b, 0, jnp.minimum(j + 1, nt - 1), 0))
            self.xc_prev = pl.BlockSpec(
                (1, H, CT, di),
                lambda b, j: (b, 0, jnp.maximum(j - 1, 0), 0))
            self.pool = pl.BlockSpec((1, CT, di), lambda b, j: (b, j, 0))
            self.pool_next = pl.BlockSpec(
                (1, CT, di), lambda b, j: (b, jnp.minimum(j + 1, nt - 1),
                                           0))
            self.pool_prev = pl.BlockSpec(
                (1, CT, di), lambda b, j: (b, jnp.maximum(j - 1, 0), 0))
            self.P = W
            self.tile_tokens = H * CT
        self.cparams = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(self.tile_tokens, di),
            dimension_semantics=("arbitrary", "arbitrary"))


def _split_params(p, use_ln, di, dm):
    (win, bin_, wcf, bcf, wab, bab, xpf, dtwf, dtbf, Af, Df,
     xpb, dtwb, dtbb, Ab, Db, lnw, lnb, wout, bout) = p
    winx, winz = win[:, :di], win[:, di:]
    return dict(
        winx=winx, winz=winz,
        binx=_zeros_or(None if bin_ is None else bin_[:di], (di,))[None],
        binz=_zeros_or(None if bin_ is None else bin_[di:], (di,))[None],
        wcf=wcf, bcf_=_zeros_or(bcf, (di,))[None],
        wab=wab, bab_=_zeros_or(bab, (di,))[None],
        lnw_=_zeros_or(lnw if use_ln else None, (di,))[None],
        lnb_=_zeros_or(lnb if use_ln else None, (di,))[None],
        wout=wout, bout_=_zeros_or(bout, (dm,))[None],
        Df=Df, Db=Db, xpf=xpf, dtwf=dtwf, dtbf=dtbf, Af=Af,
        xpb=xpb, dtwb=dtwb, dtbb=dtbb, Ab=Ab)


def _fused_fwd_impl(x_hat, p, grid, transposed, scaling, eps, use_ln,
                    dtype, scan_impl, interpret, return_saved=False):
    B, L, dm = x_hat.shape
    H, W = grid
    di = p[2].shape[1]
    assert L == H * W, (L, grid)
    x4 = x_hat.reshape(B, H, W, dm).astype(dtype)
    s = _split_params(p, use_ln, di, dm)
    winx, winz, binx, binz = s["winx"], s["winz"], s["binx"], s["binz"]
    wcf, bcf_, wab, bab_ = s["wcf"], s["bcf_"], s["wab"], s["bab_"]
    lnw_, lnb_, wout, bout_ = s["lnw_"], s["lnb_"], s["wout"], s["bout_"]
    Df, Db = s["Df"], s["Db"]

    t = _Tiling(grid, transposed, di, dm)
    vec_di, vec_dm, mat, conv_w = t.vec_di, t.vec_dm, t.mat, t.conv_w
    xh_spec, prev_spec, next_spec = t.xh, t.prev, t.next
    xc_spec, pool_spec, P, nt = t.xc, t.pool, t.P, t.nt
    cparams = t.cparams
    grid_a = (B, nt)
    # opt-in recompute mode: pass A writes only the pooled arrays and
    # pass B re-runs the x-half GEMM + conv (≈4× fewer HBM bytes) —
    # measured SLOWER (136 vs 201 img/s @2048 b2): the kernels are
    # VPU-bound on the fp32 conv rolls, not HBM-bound
    recompute = os.environ.get("FASTVIM_LF_RECOMPUTE", "0") == "1"

    if not transposed:
        RT = t.tile
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
    else:
        CT = t.tile
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

    if os.environ.get("FASTVIM_LF_NOSCAN") == "1":  # timing probe ONLY
        yf, yb = pf, pb
    elif os.environ.get("FASTVIM_LF_PAIRED", "0") == "1":
        yf, yb = _proj_scan_paired(pf, pb, s, dtype)
        yf = yf.astype(dtype)
        yb = yb.astype(dtype)
    else:
        yf = _proj_scan(pf, s["xpf"], s["dtwf"], s["dtbf"], s["Af"],
                        dtype, scan_impl, False)
        yb = _proj_scan(pb, s["xpb"], s["dtwb"], s["dtbb"], s["Ab"],
                        dtype, scan_impl, True)
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
    out = out.reshape(B, L, dm)
    if return_saved:
        if recompute:
            return out, None  # fused bwd needs materialized xc
        return out, (a_out[0], a_out[1], pf, pb)
    return out


def _fused_bwd_impl(g, x_hat, p, xc_f, xc_b, pf, pb, grid, transposed,
                    scaling, eps, use_ln, dtype, scan_impl, interpret):
    """Fused adjoint: pass-B bwd kernel → scans' VJP (XLA, pooled) →
    pass-A bwd kernel. Returns (dx_hat, dp) matching the primals."""
    (win, bin_, wcf, bcf, wab, bab, xpf, dtwf, dtbf, Af, Df,
     xpb, dtwb, dtbb, Ab, Db, lnw, lnb, wout, bout) = p
    B, L, dm = x_hat.shape
    H, W = grid
    di = wcf.shape[1]
    f32 = jnp.float32
    x4 = x_hat.reshape(B, H, W, dm).astype(dtype)
    g4 = g.reshape(B, H, W, dm).astype(dtype)
    s = _split_params(p, use_ln, di, dm)
    t = _Tiling(grid, transposed, di, dm)
    grid_a = (B, t.nt)
    mat, vec_di, vec_dm, conv_w = t.mat, t.vec_di, t.vec_dm, t.conv_w

    def mid(pf_, pb_, xpf_, dtwf_, dtbf_, Af_, xpb_, dtwb_, dtbb_, Ab_):
        yf_ = _proj_scan(pf_, xpf_, dtwf_, dtbf_, Af_, dtype, scan_impl,
                         False)
        yb_ = _proj_scan(pb_, xpb_, dtwb_, dtbb_, Ab_, dtype, scan_impl,
                         True)
        return yf_.astype(dtype), yb_.astype(dtype)

    (yf, yb), vjp_mid = jax.vjp(mid, pf, pb, xpf, dtwf, dtbf, Af,
                                xpb, dtwb, dtbb, Ab)

    if not transposed:
        S0, S1, bcast_axis = t.tile, W, 1
    else:
        S0, S1, bcast_axis = H, t.tile, 0
    kern_b = functools.partial(_pass_b_bwd_kernel, S0=S0, S1=S1, dm=dm,
                               di=di, eps=eps, use_ln=use_ln,
                               bcast_axis=bcast_axis)
    outs_b = pl.pallas_call(
        kern_b,
        grid=grid_a,
        in_specs=[t.xh, t.xh, t.xc, t.xc, t.pool, t.pool, mat(dm, di),
                  vec_di, vec_di, vec_di, vec_di, vec_di, mat(di, dm)],
        out_specs=[t.xh, t.xc, t.xc, t.pool, t.pool, mat(di, dm),
                   vec_dm, mat(dm, di), vec_di, vec_di, vec_di, vec_di,
                   vec_di],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, dm), f32),
                   jax.ShapeDtypeStruct((B, H, W, di), dtype),
                   jax.ShapeDtypeStruct((B, H, W, di), dtype),
                   jax.ShapeDtypeStruct((B, t.P, di), dtype),
                   jax.ShapeDtypeStruct((B, t.P, di), dtype),
                   jax.ShapeDtypeStruct((di, dm), f32),
                   jax.ShapeDtypeStruct((1, dm), f32),
                   jax.ShapeDtypeStruct((dm, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32)],
        compiler_params=t.cparams,
        interpret=interpret,
    )(g4, x4, xc_f, xc_b, yf, yb, s["winz"], s["binz"], Df[None],
      Db[None], s["lnw_"], s["lnb_"], wout)
    (dxh_b, dxcf, dxcb, dyf, dyb, dwout, dbout, dwinz, dbinz, dlnw,
     dlnb, dDf_a, dDb_a) = outs_b

    (dpf, dpb, dxpf, ddtwf, ddtbf, dAf, dxpb, ddtwb, ddtbb,
     dAb) = vjp_mid((dyf, dyb))

    if not transposed:
        kern_a = functools.partial(_pass_a_bwd_even_kernel, RT=t.tile,
                                   W=W, dm=dm, di=di, scaling=scaling,
                                   nt=t.nt, interpret=interpret)
    else:
        kern_a = functools.partial(_pass_a_bwd_odd_kernel, H=H,
                                   CT=t.tile, dm=dm, di=di,
                                   scaling=scaling, nt=t.nt,
                                   interpret=interpret)
    outs_a = pl.pallas_call(
        kern_a,
        grid=grid_a,
        in_specs=[t.xh, t.prev, t.next, t.xh, t.xc, t.xc, t.xc_next,
                  t.xc_prev, t.pool, t.pool, t.pool_next, t.pool_prev,
                  mat(dm, di), vec_di, conv_w, vec_di, conv_w, vec_di],
        out_specs=[t.xh, mat(dm, di), vec_di, conv_w, vec_di, conv_w,
                   vec_di],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, dm), f32),
                   jax.ShapeDtypeStruct((dm, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((PAD + 1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32),
                   jax.ShapeDtypeStruct((PAD + 1, di), f32),
                   jax.ShapeDtypeStruct((1, di), f32)],
        compiler_params=t.cparams,
        interpret=interpret,
    )(x4, x4, x4, dxh_b, dxcf, dxcb, dxcf, dxcb, dpf, dpb, dpf, dpb,
      s["winx"], s["binx"], wcf, s["bcf_"], wab, s["bab_"])
    dxh, dwinx, dbinx, dwcf, dbcf_a, dwab, dbab_a = outs_a

    dwin = jnp.concatenate([dwinx, dwinz], 1)
    dp = (
        dwin.astype(win.dtype),
        None if bin_ is None else jnp.concatenate(
            [dbinx[0], dbinz[0]]).astype(bin_.dtype),
        dwcf.astype(wcf.dtype),
        None if bcf is None else dbcf_a[0].astype(bcf.dtype),
        dwab.astype(wab.dtype),
        None if bab is None else dbab_a[0].astype(bab.dtype),
        dxpf, ddtwf, ddtbf, dAf,
        dDf_a[0].astype(Df.dtype),
        dxpb, ddtwb, ddtbb, dAb,
        dDb_a[0].astype(Db.dtype),
        dlnw[0].astype(lnw.dtype) if (use_ln and lnw is not None)
        else None,
        dlnb[0].astype(lnb.dtype) if (use_ln and lnb is not None)
        else None,
        dwout.astype(wout.dtype),
        None if bout is None else dbout[0].astype(bout.dtype),
    )
    return dxh.reshape(B, L, dm).astype(x_hat.dtype), dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7,
                                                    8, 9, 10))
def fused_mixer_core(x_hat, p, grid, transposed, scaling, eps, use_ln,
                     dtype, scan_impl, interpret, bwd_mode="fused"):
    """Fused FastVim mixer layer (in_proj → … → out_proj).

    x_hat: (B, L, d_model) normed block input. p: parameter tuple (see
    `_reference_core`). Returns (B, L, d_model). Gradient: fused
    adjoint kernels (``bwd_mode="fused"``, default — the config value
    from `MambaMixer.layer_fused_bwd`) or jax.vjp of the pure-JAX
    reference (``bwd_mode="remat"``, and always in the recompute
    forward mode, which materializes no conv outputs). The
    FASTVIM_LF_BWD env var remains an experiment-time override."""
    return _fused_fwd_impl(x_hat, p, grid, transposed, scaling, eps,
                           use_ln, dtype, scan_impl, interpret)


def _fmc_fwd(x_hat, p, grid, transposed, scaling, eps, use_ln, dtype,
             scan_impl, interpret, bwd_mode="fused"):
    out, saved = _fused_fwd_impl(x_hat, p, grid, transposed, scaling,
                                 eps, use_ln, dtype, scan_impl,
                                 interpret, return_saved=True)
    return out, (x_hat, p, saved)


def _fmc_bwd(grid, transposed, scaling, eps, use_ln, dtype, scan_impl,
             interpret, bwd_mode, res, g):
    x_hat, p, saved = res
    mode = os.environ.get("FASTVIM_LF_BWD") or bwd_mode
    if saved is None or mode == "remat":
        _, vjp = jax.vjp(
            lambda xh, pp: _reference_core(xh, pp, grid, transposed,
                                           scaling, eps, use_ln, dtype,
                                           scan_impl),
            x_hat, p)
        return vjp(g)
    return _fused_bwd_impl(g, x_hat, p, *saved, grid, transposed,
                           scaling, eps, use_ln, dtype, scan_impl,
                           interpret)


fused_mixer_core.defvjp(_fmc_fwd, _fmc_bwd)


# ----------------------------------------------------------------------
# multi-device dispatch: shard_map over the data axis
# ----------------------------------------------------------------------

def should_use_fused(flag: str, batch: int):
    """Dispatch decision for FASTVIM_LAYER_FUSED=``flag``.

    Returns ``(use, mesh)``. ``mesh`` non-None means: wrap the call in a
    data-axis shard_map (``fused_mixer_core_sharded``). Needed because
    pallas_call has no GSPMD partitioning rule — under a multi-device
    jit the compiler would replicate/gather the kernel's operands.
    Inside an existing shard_map (manual axes bound) the program is
    already per-shard, so the plain call is correct.

    ``flag`` semantics: "1" forces the fused path (any backend);
    "auto" enables it on TPU when the device context supports it
    (single device, inside shard_map, or a cached single-seq data mesh
    that divides ``batch``).
    """
    if flag not in ("1", "auto"):
        return False, None
    from jax.sharding import get_abstract_mesh

    inside_manual = bool(getattr(get_abstract_mesh(), "manual_axes", ()))
    single = jax.device_count() == 1
    if single or inside_manual:
        return (flag == "1" or jax.default_backend() == "tpu"), None
    mesh = _cached_data_mesh(batch)
    if flag == "1":
        return True, mesh  # forced: plain call even without a mesh
    return (jax.default_backend() == "tpu" and mesh is not None), mesh


def _cached_data_mesh(batch: int):
    """The process-wide ("data","seq") mesh from parallel.mesh, if it is
    usable for batch-sharding the fused layer: seq axis trivial (the
    kernel owns the full token grid) and the data axis divides batch."""
    from fastvim_tpu.parallel import mesh as pm

    m = pm._MESH
    if m is None:
        return None
    if m.shape.get("seq", 1) != 1:
        return None
    nd = m.shape.get("data", 1)
    if nd <= 1 or batch % nd != 0:
        return None
    return m


def fused_mixer_core_sharded(x_hat, p, mesh, grid, transposed, scaling,
                             eps, use_ln, dtype, scan_impl, interpret,
                             bwd_mode="fused"):
    """``fused_mixer_core`` under a data-parallel shard_map: batch
    sharded over ``mesh``'s "data" axis, params replicated. Forward is
    embarrassingly parallel (the kernel grids over batch); the VJP's
    replicated-param cotangents are psummed by shard_map's transpose
    (parity vs the unsharded call locked in tests/test_layer_fused.py).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def f(xh, pp):
        return fused_mixer_core(xh, pp, grid, transposed, scaling, eps,
                                use_ln, dtype, scan_impl, interpret,
                                bwd_mode)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P("data", None, None), P()),
        out_specs=P("data", None, None),
        check_vma=False,
    )(x_hat, p)
