"""Fused broadcast + D-skip + merge + LayerNorm + SiLU-gate Pallas kernel.

Round-3 component-cost ablation (benchmarks/component_cost_tpu.py,
@2048 b3): the mixer's post-scan merge chain
``LN((bcast(y_f)+D_f·xc_f + bcast(y_b)+D_b·xc_b)/2) · silu(z)`` costs
10.3 ms of the 34.7 ms forward — 30%, and 3× its HBM roofline (~3.3 ms
for read xc_f/xc_b/z + write out). The pooled scan outputs are tiny;
everything full-length in this chain is elementwise except the LN's
d-reduction, so one memory-bound kernel does the whole thing: each
program handles one grid row's tokens, reads the three full-length
inputs once, keeps all fp32 temporaries in VMEM, writes one bf16 output.

This is the reference's N5 "fused compressed scan" epilogue
(fastvim_kernel/.../selective_scan_fwd_kernel.cuh:122-258 fuses the
broadcast + D·u into the scan kernel) applied where our measurements say
it pays. Unlike the round-1 ``fused_block`` variants (which also pulled
the conv+pool and scan GEMMs into Pallas and lost to XLA's overlapped
schedule), this kernel leaves everything the MXU/scan pipeline overlaps
well alone.

Broadcast patterns (FastVim raster grids, mixer.py):
* even layers  (pool_axes=(1,)): token (h, w) reads pooled row h —
  the per-program y block is one (1, d) row.
* odd/transposed layers (pool_axes=(0,)): token (h, w) reads pooled
  col w — the per-program y block is the full (W, d) pooled sequence,
  elementwise-aligned with the program's tokens.

Gating: TPU only, 2-D grids, W and d_inner 8/128-aligned (Mosaic DMA
rules); callers fall back to the XLA path otherwise (mixer.py).
Backward: custom VJP recomputes through the pure-JAX reference — the
chain is cheap to rematerialize and XLA fuses its backward well.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def fusable(grid_shape: Tuple[int, ...], pool_axes: Tuple[int, ...],
            d_inner: int) -> bool:
    if len(grid_shape) != 2 or tuple(pool_axes) not in ((0,), (1,)):
        return False
    H, W = grid_shape
    return W % 8 == 0 and H >= 1 and d_inner % 128 == 0


def _kernel(xcf_ref, xcb_ref, z_ref, yf_ref, yb_ref, df_ref, db_ref,
            lw_ref, lb_ref, out_ref, *, eps: float, use_ln: bool):
    xcf = xcf_ref[0].astype(jnp.float32)          # (W, d)
    xcb = xcb_ref[0].astype(jnp.float32)
    zz = z_ref[0].astype(jnp.float32)
    yf = yf_ref[0].astype(jnp.float32)            # (1, d) or (W, d)
    yb = yb_ref[0].astype(jnp.float32)
    df = df_ref[...].astype(jnp.float32)          # (1, d)
    db = db_ref[...].astype(jnp.float32)
    m = (yf + df * xcf + yb + db * xcb) * 0.5
    if use_ln:
        mu = jnp.mean(m, axis=-1, keepdims=True)
        var = jnp.mean(m * m, axis=-1, keepdims=True) - mu * mu
        m = (m - mu) * jax.lax.rsqrt(var + eps)
        m = m * lw_ref[...].astype(jnp.float32) \
            + lb_ref[...].astype(jnp.float32)
    # fp32 operands: the Mosaic bf16 vector.broadcast silu bug
    # (CLAUDE.md) does not apply
    m = m * (zz * jax.nn.sigmoid(zz))
    out_ref[0] = m.astype(out_ref.dtype)


def _merge_ref(xc_f, xc_b, z, yf, yb, Df, Db, lw, lb, grid_shape,
               pool_axes, eps, use_ln):
    """Pure-JAX reference (exactly the mixer's XLA path)."""
    from fastvim_tpu.ops.norms import layer_norm
    from fastvim_tpu.ops.scan import broadcast_grid

    dtype = xc_f.dtype
    y_f = broadcast_grid(yf, grid_shape, pool_axes) \
        + Df.astype(dtype)[None, None] * xc_f
    y_b = broadcast_grid(yb, grid_shape, pool_axes) \
        + Db.astype(dtype)[None, None] * xc_b
    merged = (y_f + y_b) * jnp.asarray(0.5, dtype)
    if use_ln:
        merged = layer_norm(merged, lw, lb, eps=eps)
    return merged * jax.nn.silu(z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def merge_ln_gate(xc_f, xc_b, z, yf, yb, Df, Db, lw, lb, grid_shape,
                  pool_axes, eps, use_ln, interpret):
    """xc_f/xc_b/z: (B, L, d); yf/yb: (B, P, d) pooled scan outputs;
    Df/Db/lw/lb: (d,). Returns the gated merged activation (B, L, d)."""
    H, W = grid_shape
    B, L, d = xc_f.shape
    assert L == H * W, (L, grid_shape)
    along_w = tuple(pool_axes) == (1,)
    P = H if along_w else W
    assert yf.shape == (B, P, d), (yf.shape, (B, P, d))

    if along_w:
        # one pooled row per program; reshape to (B*H, 1, d) so the
        # (1, 1, d) block's dims equal the array dims (Mosaic's 8/128
        # divisibility rule exempts full-dimension blocks)
        yf = yf.reshape(B * H, 1, d)
        yb = yb.reshape(B * H, 1, d)
        y_spec = pl.BlockSpec((1, 1, d), lambda b, h: (b * H + h, 0, 0))
    else:
        y_spec = pl.BlockSpec((1, P, d), lambda b, h: (b, 0, 0))
    row_spec = pl.BlockSpec((1, W, d), lambda b, h: (b, h, 0))
    vec_spec = pl.BlockSpec((1, d), lambda b, h: (0, 0))

    lw_ = (jnp.ones((d,), jnp.float32) if lw is None else lw)[None]
    lb_ = (jnp.zeros((d,), jnp.float32) if lb is None else lb)[None]
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, use_ln=use_ln),
        grid=(B, H),
        in_specs=[row_spec, row_spec, row_spec, y_spec, y_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((B, H * W, d), xc_f.dtype),
        interpret=interpret,
    )(xc_f.reshape(B, L, d), xc_b.reshape(B, L, d), z,
      yf, yb, Df[None], Db[None], lw_, lb_)
    return out


def _fwd(xc_f, xc_b, z, yf, yb, Df, Db, lw, lb, grid_shape, pool_axes,
         eps, use_ln, interpret):
    out = merge_ln_gate(xc_f, xc_b, z, yf, yb, Df, Db, lw, lb,
                        grid_shape, pool_axes, eps, use_ln, interpret)
    return out, (xc_f, xc_b, z, yf, yb, Df, Db, lw, lb)


def _bwd(grid_shape, pool_axes, eps, use_ln, interpret, res, g):
    xc_f, xc_b, z, yf, yb, Df, Db, lw, lb = res
    has_ln = lw is not None

    def ref(xc_f, xc_b, z, yf, yb, Df, Db, lw, lb):
        return _merge_ref(xc_f, xc_b, z, yf, yb, Df, Db,
                          lw if has_ln else None,
                          lb if has_ln else None,
                          grid_shape, pool_axes, eps, use_ln)

    d = xc_f.shape[-1]
    lw_ = lw if has_ln else jnp.ones((d,), jnp.float32)
    lb_ = lb if has_ln else jnp.zeros((d,), jnp.float32)
    _, vjp = jax.vjp(ref, xc_f, xc_b, z, yf, yb, Df, Db, lw_, lb_)
    grads = vjp(g)
    if not has_ln:
        grads = grads[:7] + (None, None)
    return grads


merge_ln_gate.defvjp(_fwd, _bwd)
