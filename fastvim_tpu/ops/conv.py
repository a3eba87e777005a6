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
