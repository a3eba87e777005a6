"""Depthwise causal conv1d fused with SiLU, channels-last.

TPU-native replacement for the reference's `causal_conv1d` CUDA package
(used at `mamba_simple_faster.py:274-285`): a width-``w`` (default 4)
depthwise causal convolution along the token axis followed by SiLU.

Implemented as ``w`` shifted multiply-adds instead of
``lax.conv_general_dilated`` — for tiny kernel widths this lowers to pure
VPU elementwise ops that XLA fuses with surrounding producers/consumers,
avoiding a convolution layout pass entirely.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def causal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Array:
    """x: (batch, L, d); weight: (width, d); bias: (d,).

    y[:, t, :] = sum_k weight[k] * x[:, t - (width-1) + k, :]  (zero-padded)
    """
    width, d = weight.shape
    assert x.shape[-1] == d, (x.shape, weight.shape)
    L = x.shape[1]
    pad = width - 1
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    y = None
    for k in range(width):
        term = xp[:, k : k + L, :] * weight[k][None, None, :]
        y = term if y is None else y + term
    if bias is not None:
        y = y + bias[None, None, :]
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y


def anticausal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Array:
    """Causal conv of the *reversed* sequence, expressed in original order.

    flip(causal_conv1d(flip(x), w)) == anticausal_conv1d(x, w):
    y[t] = sum_j w[width-1-j] * x[t + j] (zero-padded at the end). Lets the
    bidirectional mixer's reverse branch run without materializing
    full-length flipped activations (the reference flips, mamba_simple_
    faster.py:272; on TPU the flip is a full HBM round-trip worth
    avoiding).
    """
    width, d = weight.shape
    assert x.shape[-1] == d, (x.shape, weight.shape)
    L = x.shape[1]
    pad = width - 1
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    y = None
    for j in range(width):
        term = xp[:, j : j + L, :] * weight[width - 1 - j][None, None, :]
        y = term if y is None else y + term
    if bias is not None:
        y = y + bias[None, None, :]
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y


def dual_conv1d(
    x: Array,
    weight_c: Array, bias_c: Optional[Array],
    weight_a: Array, bias_a: Optional[Array],
    activation: Optional[str] = "silu",
) -> tuple:
    """Causal + anticausal depthwise convs of the SAME input in one pass.

    The bidirectional mixer needs conv(x) for the forward branch and
    anticausal-conv(x) for the reverse branch. Computing them separately
    costs two reads of x and 8 shifted slices; here x is padded once on
    both sides and the 7 distinct shifts are shared — XLA fuses both
    outputs into one elementwise pipeline over x (measured win at 2048px,
    see CLAUDE.md round-2 notes).
    """
    width, d = weight_c.shape
    assert weight_a.shape == (width, d)
    L = x.shape[1]
    pad = width - 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    shifts = [xp[:, j : j + L, :] for j in range(2 * pad + 1)]
    yc = None
    ya = None
    for k in range(width):
        # causal: y[t] += w_c[k] x[t-(w-1)+k]  → shift index k
        tc = shifts[k] * weight_c[k][None, None, :]
        yc = tc if yc is None else yc + tc
        # anticausal: y[t] += w_a[w-1-j] x[t+j] → shift index pad+j
        ta = shifts[pad + k] * weight_a[width - 1 - k][None, None, :]
        ya = ta if ya is None else ya + ta
    if bias_c is not None:
        yc = yc + bias_c[None, None, :]
    if bias_a is not None:
        ya = ya + bias_a[None, None, :]
    if activation == "silu":
        yc = jax.nn.silu(yc)
        ya = jax.nn.silu(ya)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return yc, ya


def grid_dual_conv1d(
    x: Array,
    weight_c: Array, bias_c: Optional[Array],
    weight_a: Array, bias_a: Optional[Array],
    grid: tuple,
    axis: int,
    activation: Optional[str] = "silu",
) -> tuple:
    """Causal + anticausal depthwise convs along a token GRID axis,
    computed in raster layout via one 2-D depthwise convolution per
    direction plus tiny boundary-wrap corrections.

    ``axis=0``: conv along the TRANSPOSED raster (column-major order) —
    FastVim's rotated odd layers. The reference (and our round-1 code)
    materializes the transposed sequence (models/fastvim.py:192-211);
    that cost two full-HBM relayouts per odd block (~13% of the 2048px
    forward). Here XLA's native NHWC depthwise conv with a (width, 1)
    filter does the vertical taps without materializing shifted copies,
    and the cross-column wraparound (first/last width-1 rows of each
    column take taps from the neighbouring column's far end) is a tiny
    (B, width-1, W, d) correction.

    ``axis=1``: conv along the ordinary raster — the even layers; a
    (1, width) filter along W with cross-ROW wraparound corrections.
    Replaces the flattened-L shifted-add formulation (whose sublane-shift
    relayouts cost ~18%).

    Exactly equal to the flat 1-D convs — locked by tests/test_ops.py.
    Measured 66.2 → 74+ img/s @2048 (CLAUDE.md round-2 notes).
    """
    width, d = weight_c.shape
    B, L, _ = x.shape
    H, W = grid
    assert H * W == L, (grid, L)
    n_axis = grid[axis]
    if n_axis < width:
        # taps would wrap more than one line (degenerate ≤3-extent grids
        # only — real models have ≥7-token grid axes): fall back to the
        # flat formulation in the right order
        if axis == 1:
            return dual_conv1d(x, weight_c, bias_c, weight_a, bias_a,
                               activation)
        xt = x.reshape(B, H, W, d).swapaxes(1, 2).reshape(B, L, d)
        yc, ya = dual_conv1d(xt, weight_c, bias_c, weight_a, bias_a,
                             activation)
        back = lambda y: y.reshape(B, W, H, d).swapaxes(1, 2).reshape(
            B, L, d)
        return back(yc), back(ya)
    xg = x.reshape(B, H, W, d)
    dn = ("NHWC", "HWIO", "NHWC")
    import os

    if axis == 0 and os.environ.get("FASTVIM_GRIDCONV", "conv") == "shift":
        # H-axis shifted-add variant: shifts along H (a major dim in
        # NHWC) are plain offset slices — no lane/sublane relayout,
        # unlike the conv op whose layout assignment inserted
        # (B,H,W,d) transposed copies (round-3 HLO audit). Shares the 7
        # padded slices between both directions like dual_conv1d.
        pad = width - 1
        xp = jnp.pad(xg, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        shifts = [xp[:, j:j + H] for j in range(2 * pad + 1)]
        yc = None
        ya = None
        for k in range(width):
            tc = shifts[k] * weight_c[k][None, None, None, :]
            yc = tc if yc is None else yc + tc
            ta = shifts[pad + k] * weight_a[width - 1 - k][None, None,
                                                           None, :]
            ya = ta if ya is None else ya + ta
    else:
        if axis == 0:
            filt_c = weight_c[:, None, None, :]    # (width, 1, 1, d)
            filt_a = weight_a[::-1, None, None, :]
            pad_c = [(width - 1, 0), (0, 0)]
            pad_a = [(0, width - 1), (0, 0)]
        else:
            filt_c = weight_c[None, :, None, :]    # (1, width, 1, d)
            filt_a = weight_a[None, ::-1, None, :]
            pad_c = [(0, 0), (width - 1, 0)]
            pad_a = [(0, 0), (0, width - 1)]
        yc = jax.lax.conv_general_dilated(
            xg, filt_c, window_strides=(1, 1), padding=pad_c,
            feature_group_count=d, dimension_numbers=dn,
            preferred_element_type=xg.dtype)
        ya = jax.lax.conv_general_dilated(
            xg, filt_a, window_strides=(1, 1), padding=pad_a,
            feature_group_count=d, dimension_numbers=dn,
            preferred_element_type=xg.dtype)
    # boundary-wrap corrections along the conv axis, pulling from the
    # neighbouring line on the OTHER axis
    if axis == 0:
        prev_end = jnp.pad(xg[:, H - (width - 1):, : W - 1],
                           ((0, 0), (0, 0), (1, 0), (0, 0)))
        next_start = jnp.pad(xg[:, : width - 1, 1:],
                             ((0, 0), (0, 0), (0, 1), (0, 0)))
        sel = lambda t, r: t[:, r]              # (B, W, d)
    else:
        prev_end = jnp.pad(xg[:, : H - 1, W - (width - 1):],
                           ((0, 0), (1, 0), (0, 0), (0, 0)))
        next_start = jnp.pad(xg[:, 1:, : width - 1],
                             ((0, 0), (0, 1), (0, 0), (0, 0)))
        sel = lambda t, r: t[:, :, r]           # (B, H, d)
    cc = []
    ca = []
    for h in range(width - 1):
        fix_c = sum(weight_c[width - 1 - j][None, None, :]
                    * sel(prev_end, width - 1 - (j - h))
                    for j in range(h + 1, width))
        cc.append(fix_c)
        fix_a = sum(weight_a[width - 1 - j][None, None, :]
                    * sel(next_start, h + j - (width - 1))
                    for j in range(width - 1 - h, width))
        ca.append(fix_a)
    if axis == 0:
        yc = yc.at[:, : width - 1].add(jnp.stack(cc, axis=1))
        ya = ya.at[:, H - (width - 1):].add(jnp.stack(ca, axis=1))
    else:
        yc = yc.at[:, :, : width - 1].add(jnp.stack(cc, axis=2))
        ya = ya.at[:, :, W - (width - 1):].add(jnp.stack(ca, axis=2))
    if bias_c is not None:
        yc = yc + bias_c[None, None, None, :]
    if bias_a is not None:
        ya = ya + bias_a[None, None, None, :]
    if activation == "silu":
        yc = jax.nn.silu(yc)
        ya = jax.nn.silu(ya)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return yc.reshape(B, L, d), ya.reshape(B, L, d)


def transposed_dual_conv1d(x, weight_c, bias_c, weight_a, bias_a, grid,
                           activation: Optional[str] = "silu"):
    """Back-compat wrapper: the transposed-raster (axis 0) grid conv."""
    return grid_dual_conv1d(x, weight_c, bias_c, weight_a, bias_a, grid,
                            axis=0, activation=activation)


def channel_grid_dual_conv1d(
    x: Array,
    weight_c: Array, bias_c: Optional[Array],
    weight_a: Array, bias_a: Optional[Array],
    grid: tuple,
    activation: Optional[str] = "silu",
) -> tuple:
    """Causal + anticausal depthwise convs along the ROTATED raster of a
    Channel-First 3-D token grid, computed in the UNROTATED layout.

    ChannelVim's odd layers swap the two spatial axes of the
    (rows, cols, C) grid (models_channel_mamba_faster.py:296-331 rotates
    the sequence); materializing that swap costs two full-HBM relayouts
    per odd block — the exact cost the 2-D dense path already eliminated
    (ops/conv.grid_dual_conv1d). This is the 3-D Channel-First
    equivalent: the rotated raster enumerates (col, row, ch) with ch
    fastest, so a shift by ``s ≤ C-1`` positions along the rotated
    sequence is, in unrotated layout, a shift along the C axis with a
    one-row wrap (and a one-column wrap at row 0) — all static slices
    and concats, no transposes.

    Requires C ≥ conv width (taps wrap at most one row); callers fall
    back to the materialized-rotation path for C < width (HCS buckets
    with 1-3 channels). Exactly equal to
    rotate → dual_conv1d → unrotate — locked by tests/test_ops.py.
    """
    width, d = weight_c.shape
    B, L, _ = x.shape
    H, W, C = grid
    assert H * W * C == L, (grid, L)
    assert C >= width, (C, width)
    xg = x.reshape(B, H, W, C, d)
    pad = width - 1

    def back_shift(s):
        """x shifted s positions back along the rotated (c, r, ch) order,
        zeros before the global sequence start."""
        if s == 0:
            return xg
        core = xg[:, :, :, : C - s, :]                 # ch-s, same row
        wrap_rows = xg[:, : H - 1, :, C - s:, :]       # row r-1, rows≥1
        # row 0 wraps to the previous COLUMN's last row (rotated order
        # runs columns outermost); zeros at (r=0, c=0) = sequence start
        wrap_r0 = jnp.pad(xg[:, H - 1:, : W - 1, C - s:, :],
                          ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        wrap = jnp.concatenate([wrap_r0, wrap_rows], axis=1)
        return jnp.concatenate([wrap, core], axis=3)

    def fwd_shift(s):
        """x shifted s positions forward along the rotated order."""
        if s == 0:
            return xg
        core = xg[:, :, :, s:, :]                      # ch+s, same row
        wrap_rows = xg[:, 1:, :, :s, :]                # row r+1, rows<H-1
        wrap_rH = jnp.pad(xg[:, :1, 1:, :s, :],        # last row → next col
                          ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
        wrap = jnp.concatenate([wrap_rows, wrap_rH], axis=1)
        return jnp.concatenate([core, wrap], axis=3)

    yc = None
    ya = None
    for k in range(width):
        # causal: y[t] += w_c[k]·x[t-(w-1)+k] → back shift s = w-1-k
        tc = back_shift(pad - k) * weight_c[k][None, None, None, None, :]
        yc = tc if yc is None else yc + tc
        # anticausal: y[t] += w_a[w-1-j]·x[t+j] → forward shift j = k
        ta = fwd_shift(k) * weight_a[width - 1 - k][None, None, None,
                                                    None, :]
        ya = ta if ya is None else ya + ta
    if bias_c is not None:
        yc = yc + bias_c[None, None, None, None, :]
    if bias_a is not None:
        ya = ya + bias_a[None, None, None, None, :]
    if activation == "silu":
        yc = jax.nn.silu(yc)
        ya = jax.nn.silu(ya)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return yc.reshape(B, L, d), ya.reshape(B, L, d)


def causal_conv1d_update(
    x: Array, conv_state: Array, weight: Array,
    bias: Optional[Array] = None, activation: Optional[str] = "silu",
):
    """Single-token step for incremental decoding.

    x: (batch, d) new token; conv_state: (batch, width, d) rolling window
    (oldest first). Returns (y, new_conv_state). Mirrors the reference's
    `causal_conv1d_update` semantics used by `Mamba.step`
    (mamba_simple.py:409-...).
    """
    new_state = jnp.concatenate([conv_state[:, 1:], x[:, None, :]], axis=1)
    y = jnp.einsum("bwd,wd->bd", new_state, weight)
    if bias is not None:
        y = y + bias[None, :]
    if activation == "silu":
        y = jax.nn.silu(y)
    return y, new_state
