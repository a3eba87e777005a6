"""Single-timestep SSM state update for incremental decoding.

TPU-native equivalent of the reference Triton kernel
(`mamba-1p1p1/mamba_ssm/ops/triton/selective_state_update.py:127`):

    state ← state * exp(softplus(dt + dt_bias) ⊗ A) + dt * B * x
    y = <C, state> + D * x   (optionally gated by silu(z))

Trivially XLA-fusible on TPU — one elementwise pipeline over (batch, d, n).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def selective_state_update(
    state: Array,  # (batch, d, n) fp32
    x: Array,      # (batch, d)
    dt: Array,     # (batch, d)
    A: Array,      # (d, n)
    B: Array,      # (batch, n)
    C: Array,      # (batch, n)
    D: Optional[Array] = None,       # (d,)
    z: Optional[Array] = None,       # (batch, d)
    dt_bias: Optional[Array] = None,  # (d,)
    dt_softplus: bool = False,
):
    """Returns (y (batch, d), new_state (batch, d, n))."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, :]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    dA = jnp.exp(dt[..., None] * A.astype(jnp.float32)[None])  # (b, d, n)
    dBx = dt[..., None] * B.astype(jnp.float32)[:, None, :] * x32[..., None]
    new_state = state * dA + dBx
    y = jnp.sum(new_state * C.astype(jnp.float32)[:, None, :], axis=-1)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :] * x32
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype), new_state
