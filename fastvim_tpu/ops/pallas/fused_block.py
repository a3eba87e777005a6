"""Fused FastVim block kernels (Pallas TPU).

The FastVim mixer's cost at high resolution is pure HBM traffic on
full-length activations; the scan itself runs over the pooled rows and is
tiny. These two kernels collapse the per-direction elementwise chain into
two passes over the token sequence (the TPU counterpart — and superset —
of the reference's fused `fastvim_kernel` N5, which only fused
scan+broadcast and kept the full output in shared memory,
fwd_kernel.cuh:92):

* ``conv_pool``: one read of the in-proj output x computes BOTH direction
  convs (causal and anticausal, see ops/conv.py) with SiLU and reduces
  them to the pooled row means/maxes in VMEM — conv outputs are never
  written to HBM.
* ``merge_gate``: one read of x (+ z and the tiny per-row scan outputs)
  RE-computes both convs (4 taps each — cheaper than an HBM round-trip),
  broadcasts the scan outputs over their rows, applies the D·conv skip,
  averages directions, LayerNorms (fp32 stats) and applies the
  silu(z) gate, writing only the merged (L, d) output.

Tiles are whole grid rows (T = rows_per_tile·cols tokens) so pooling
never crosses tiles. The conv's 3-token halo at tile boundaries comes
from small precomputed halo arrays (B, n_tiles, 8, d) fed as ordinary
pipelined BlockSpec inputs — Pallas double-buffers every input, so HBM
loads overlap compute (a manual-DMA variant measured ~15% slower than
pure XLA; this pipelined form is what makes the fusion pay).

Gradients: custom VJP recomputes through the jnp reference implementations
(`conv_pool_ref` / `merge_gate_ref`) — the fused kernels accelerate
inference and the forward pass; backward math is XLA's.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fastvim_tpu.ops.conv import anticausal_conv1d, causal_conv1d

Array = jax.Array

def _silu(v):
    """silu without scalar constants: jax.nn.silu's sigmoid lowers with
    weak-f32 scalars that Mosaic's bf16 vector.broadcast verifier
    rejects; v/(1+e^-v) with a ones_like keeps every operand a full
    vector of v's dtype."""
    return v / (jnp.ones_like(v) + jnp.exp(-v))


PAD = 3    # d_conv - 1 (the conv reach)
HALO = 8   # tokens carried per side (8-aligned for clean VMEM concat)

# VMEM budget for the kernels' fp32 working set (~8 tile-sized
# temporaries: concat window, conv accumulators, merged, gate, casts),
# leaving room for double-buffered bf16 I/O under the 16MB VMEM.
_FP32_WORK_BUDGET = 15 * 1024 * 1024
_FP32_TEMPS = 6  # calibrated: T=2048,d=384 measured 17.1MB scoped


def _fits(rpt: int, cols: int, d: int) -> bool:
    return rpt * cols * d * 4 * _FP32_TEMPS <= _FP32_WORK_BUDGET


def _pick_tile(rows: int, cols: int, d: int) -> Optional[int]:
    """rows_per_tile: Mosaic requires the pooled-output block's sublane
    dim to be a multiple of 8 or the full rows — so candidates are
    multiple-of-8 divisors of rows, plus rows itself (single tile).
    Pick the largest candidate whose fp32 working set fits VMEM."""
    cands = [c for c in range(8, rows + 1, 8) if rows % c == 0]
    fitting = [c for c in cands if _fits(c, cols, d)]
    if fitting:
        return max(fitting)
    if _fits(rows, cols, d):
        return rows  # single tile (covers small/unaligned grids)
    return None  # even the smallest valid tile would blow VMEM


def fusable(rows: int, cols: int, d: int = 384,
            itemsize: int = 2) -> bool:
    return _pick_tile(rows, cols, d) is not None


def _halo_arrays(x: Array, T: int, n_tiles: int) -> Tuple[Array, Array]:
    """pre[b,t] = x[b, t·T-HALO : t·T] (zero-padded at the left edge);
    post[b,t] = x[b, (t+1)·T : (t+1)·T+HALO] (zero-padded at the right).
    Tiny gathers (B, n_tiles, HALO, d) built in XLA."""
    B, L, d = x.shape
    tiles = jnp.arange(n_tiles)
    offs = jnp.arange(HALO)
    idx_pre = tiles[:, None] * T - HALO + offs[None, :]
    idx_post = (tiles[:, None] + 1) * T + offs[None, :]

    def take(idx):
        valid = (idx >= 0) & (idx < L)
        safe = jnp.clip(idx, 0, L - 1)
        vals = x[:, safe.reshape(-1), :].reshape(B, n_tiles, HALO, d)
        return jnp.where(valid[None, :, :, None], vals, 0)

    return take(idx_pre), take(idx_post)


def _convs_from_tile(pre, xt, post, wf, bf, wb, bb, T):
    """pre/post: (HALO, d); xt: (T, d) → causal & anticausal conv+SiLU,
    each (T, d) in xt's dtype. Token i of the tile sits at index i+HALO
    of the concatenated window. Compute stays in the input dtype (bf16
    for the production path — same numerics as the XLA conv, and the
    sublane-shift relayouts that dominate this kernel cost half as much
    as in fp32)."""
    dt = xt.dtype
    xb = jnp.concatenate([pre.astype(dt), xt, post.astype(dt)], axis=0)
    conv_f = None
    conv_b = None
    for k in range(PAD + 1):
        seg_f = jax.lax.slice_in_dim(xb, HALO - PAD + k,
                                     HALO - PAD + k + T, axis=0)
        term_f = seg_f * wf[k][None, :].astype(dt)
        conv_f = term_f if conv_f is None else conv_f + term_f
        seg_b = jax.lax.slice_in_dim(xb, HALO + k, HALO + k + T, axis=0)
        term_b = seg_b * wb[PAD - k][None, :].astype(dt)
        conv_b = term_b if conv_b is None else conv_b + term_b
    conv_f = _silu(conv_f + bf[None, :].astype(dt))
    conv_b = _silu(conv_b + bb[None, :].astype(dt))
    return conv_f, conv_b


def _conv_pool_kernel(x_ref, pre_ref, post_ref, wf, bf, wb, bb,
                      pf_ref, pb_ref, *, T, rows_per_tile, cols, d,
                      method, scaling):
    xt = x_ref[0]
    pre = pre_ref[0, 0]
    post = post_ref[0, 0]
    conv_f, conv_b = _convs_from_tile(pre, xt, post, wf[...], bf[0],
                                      wb[...], bb[0], T)
    cf = conv_f.reshape(rows_per_tile, cols, d)
    cb = conv_b.reshape(rows_per_tile, cols, d)
    if method == "mean":
        # fp32 accumulation over the pooled axis
        pf = jnp.mean(cf.astype(jnp.float32), axis=1) * scaling
        pb = jnp.mean(cb.astype(jnp.float32), axis=1) * scaling
    else:
        pf = jnp.max(cf, axis=1).astype(jnp.float32)
        pb = jnp.max(cb, axis=1).astype(jnp.float32)
    pf_ref[0] = pf
    pb_ref[0] = pb


def _merge_kernel(x_ref, pre_ref, post_ref, z_ref, yf_ref, yb_ref,
                  wf, bf, wb, bb, df, db, lnw, lnb, out_ref, *,
                  T, rows_per_tile, cols, d, eps, use_norm):
    xt = x_ref[0]
    dt = xt.dtype
    pre = pre_ref[0, 0]
    post = post_ref[0, 0]
    conv_f, conv_b = _convs_from_tile(pre, xt, post, wf[...], bf[0],
                                      wb[...], bb[0], T)
    yf = yf_ref[0].astype(dt)  # (rows_per_tile, d)
    yb = yb_ref[0].astype(dt)
    cf = conv_f.reshape(rows_per_tile, cols, d)
    cb = conv_b.reshape(rows_per_tile, cols, d)
    # NOTE: the direction average's ÷2 is deferred — LayerNorm is
    # scale-invariant so the normed path never needs it (only eps shifts
    # by 4×, matched below); the un-normed path applies it in fp32
    # (Mosaic rejects bf16-scalar broadcasts).
    m = (yf[:, None, :] + df[0][None, None, :].astype(dt) * cf
         + yb[:, None, :] + db[0][None, None, :].astype(dt) * cb)
    m = m.reshape(T, d)
    if use_norm:
        # fp32 statistics without materializing an fp32 copy of m;
        # stats of 2·x with eps·4 ≙ stats of x with eps
        m32 = m.astype(jnp.float32)
        mu = jnp.mean(m32, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(m32), axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mu), 0.0)
        m32 = (m32 - mu) * jax.lax.rsqrt(var + 4.0 * eps)
        m32 = m32 * lnw[0][None, :] + lnb[0][None, :]
        out = m32.astype(dt) * _silu(z_ref[0])
    else:
        out = (m.astype(jnp.float32) * 0.5).astype(dt) \
            * _silu(z_ref[0])
    out_ref[0] = out.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# jnp reference implementations (oracles + autodiff backward)
# ---------------------------------------------------------------------------

def conv_pool_ref(x, wf, bf, wb, bb, rows, cols, method="mean",
                  scaling=1.0):
    """x: (B, L, d) UNpadded. Returns (pooled_f, pooled_b) (B, rows, d)
    fp32."""
    from fastvim_tpu.ops.scan import pool_grid

    cf = causal_conv1d(x.astype(jnp.float32), wf.astype(jnp.float32),
                       bf.astype(jnp.float32))
    cb = anticausal_conv1d(x.astype(jnp.float32), wb.astype(jnp.float32),
                           bb.astype(jnp.float32))
    pf = pool_grid(cf, (rows, cols), (1,), method, scaling)
    pb = pool_grid(cb, (rows, cols), (1,), method, scaling)
    return pf, pb


def merge_gate_ref(x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb,
                   rows, cols, eps=1e-5, use_norm=True):
    """Reference for the merge kernel. x/z (B, L, d); y_f/y_b (B, rows, d).
    Returns merged (B, L, d) in x.dtype."""
    from fastvim_tpu.ops.scan import broadcast_grid

    cf = causal_conv1d(x.astype(jnp.float32), wf.astype(jnp.float32),
                       bf.astype(jnp.float32))
    cb = anticausal_conv1d(x.astype(jnp.float32), wb.astype(jnp.float32),
                           bb.astype(jnp.float32))
    out_f = broadcast_grid(y_f.astype(jnp.float32), (rows, cols), (1,)) \
        + df.astype(jnp.float32)[None, None] * cf
    out_b = broadcast_grid(y_b.astype(jnp.float32), (rows, cols), (1,)) \
        + db.astype(jnp.float32)[None, None] * cb
    m = (out_f + out_b) * 0.5
    if use_norm:
        mu = m.mean(-1, keepdims=True)
        var = ((m - mu) ** 2).mean(-1, keepdims=True)
        m = (m - mu) * jax.lax.rsqrt(var + eps)
        m = m * lnw.astype(jnp.float32)[None, None] \
            + lnb.astype(jnp.float32)[None, None]
    return (m * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)


# ---------------------------------------------------------------------------
# public entry points with custom VJP
# ---------------------------------------------------------------------------

def _small_specs(d):
    return [
        pl.BlockSpec((PAD + 1, d), lambda b, t: (0, 0)),
        pl.BlockSpec((1, d), lambda b, t: (0, 0)),
        pl.BlockSpec((PAD + 1, d), lambda b, t: (0, 0)),
        pl.BlockSpec((1, d), lambda b, t: (0, 0)),
    ]


def _conv_pool_fwd_impl(x, wf, bf, wb, bb, rows, cols, method, scaling,
                        interpret):
    B, L, d = x.shape
    assert L == rows * cols
    rpt = _pick_tile(rows, cols, d)
    T = rpt * cols
    n_tiles = rows // rpt
    pre, post = _halo_arrays(x, T, n_tiles)
    kernel = functools.partial(
        _conv_pool_kernel, T=T, rows_per_tile=rpt, cols=cols, d=d,
        method=method, scaling=scaling)
    grid = (B, n_tiles)
    halo_spec = pl.BlockSpec((1, 1, HALO, d), lambda b, t: (b, t, 0, 0))
    pf, pb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, d), lambda b, t: (b, t, 0)),
            halo_spec, halo_spec,
            *_small_specs(d),
        ],
        out_specs=(
            pl.BlockSpec((1, rpt, d), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, rpt, d), lambda b, t: (b, t, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, rows, d), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, d), jnp.float32),
        ),
        interpret=interpret,
    )(x, pre, post,
      wf.astype(jnp.float32), bf.astype(jnp.float32)[None],
      wb.astype(jnp.float32), bb.astype(jnp.float32)[None])
    return pf, pb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def conv_pool(x, wf, bf, wb, bb, rows, cols, method="mean", scaling=1.0,
              interpret=False):
    return _conv_pool_fwd_impl(x, wf, bf, wb, bb, rows, cols, method,
                               scaling, interpret)


def _conv_pool_vjp_fwd(x, wf, bf, wb, bb, rows, cols, method, scaling,
                       interpret):
    out = _conv_pool_fwd_impl(x, wf, bf, wb, bb, rows, cols, method,
                              scaling, interpret)
    return out, (x, wf, bf, wb, bb)


def _conv_pool_vjp_bwd(rows, cols, method, scaling, interpret, res, g):
    x, wf, bf, wb, bb = res
    _, vjp = jax.vjp(
        lambda *a: conv_pool_ref(*a, rows, cols, method, scaling),
        x, wf, bf, wb, bb)
    return vjp(g)


conv_pool.defvjp(_conv_pool_vjp_fwd, _conv_pool_vjp_bwd)


def _merge_gate_fwd_impl(x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb,
                         rows, cols, eps, use_norm, interpret):
    B, L, d = x.shape
    rpt = _pick_tile(rows, cols, d)
    T = rpt * cols
    n_tiles = rows // rpt
    pre, post = _halo_arrays(x, T, n_tiles)
    kernel = functools.partial(
        _merge_kernel, T=T, rows_per_tile=rpt, cols=cols, d=d, eps=eps,
        use_norm=use_norm)
    grid = (B, n_tiles)
    halo_spec = pl.BlockSpec((1, 1, HALO, d), lambda b, t: (b, t, 0, 0))
    vec = pl.BlockSpec((1, d), lambda b, t: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, d), lambda b, t: (b, t, 0)),
            halo_spec, halo_spec,
            pl.BlockSpec((1, T, d), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, rpt, d), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, rpt, d), lambda b, t: (b, t, 0)),
            *_small_specs(d),
            vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, T, d), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, d), x.dtype),
        interpret=interpret,
    )(x, pre, post, z, y_f, y_b,
      wf.astype(jnp.float32), bf.astype(jnp.float32)[None],
      wb.astype(jnp.float32), bb.astype(jnp.float32)[None],
      df.astype(jnp.float32)[None], db.astype(jnp.float32)[None],
      lnw.astype(jnp.float32)[None], lnb.astype(jnp.float32)[None])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def merge_gate(x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb,
               rows, cols, eps=1e-5, use_norm=True, interpret=False):
    return _merge_gate_fwd_impl(x, z, y_f, y_b, wf, bf, wb, bb, df, db,
                                lnw, lnb, rows, cols, eps, use_norm,
                                interpret)


def _merge_vjp_fwd(x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb,
                   rows, cols, eps, use_norm, interpret):
    out = _merge_gate_fwd_impl(x, z, y_f, y_b, wf, bf, wb, bb, df, db,
                               lnw, lnb, rows, cols, eps, use_norm,
                               interpret)
    return out, (x, z, y_f, y_b, wf, bf, wb, bb, df, db, lnw, lnb)


def _merge_vjp_bwd(rows, cols, eps, use_norm, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: merge_gate_ref(*a, rows, cols, eps, use_norm), *res)
    return vjp(g)


merge_gate.defvjp(_merge_vjp_fwd, _merge_vjp_bwd)
