"""Fused add + LayerNorm/RMSNorm with an fp32 residual stream.

TPU-native equivalent of the reference Triton kernels
(`mamba-1p1p1/mamba_ssm/ops/triton/layernorm.py:492-539`): with
``prenorm=True`` returns ``(normed, residual_out)`` where
``residual_out = x + residual`` kept in fp32, enabling the Add→Norm fusion
pattern of the reference Block (models/fastvim.py:167-190). On TPU, XLA
fuses the add, the moment reductions, and the normalization into one
elementwise pipeline; no hand-written kernel is needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _norm(x: Array, weight: Array, bias: Optional[Array], eps: float,
          rms: bool) -> Array:
    """Normalize with fp32 statistics without materializing an fp32 copy
    of x: reductions accumulate in fp32 (one fused pass computes both
    moments — E[x²]−E[x]², the same single-pass trick the reference
    Triton kernel uses), and the per-element fp32 upcast fuses into the
    output pipeline."""
    if rms:
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    else:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def add_norm(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    residual: Optional[Array] = None,
    prenorm: bool = False,
    residual_in_fp32: bool = True,
    eps: float = 1e-5,
    rms: bool = False,
    out_dtype: Optional[jnp.dtype] = None,
):
    """Fused (x + residual) → norm.

    Returns ``normed`` or, when ``prenorm=True``, ``(normed, residual_out)``
    with ``residual_out`` in fp32 when ``residual_in_fp32``.
    """
    out_dtype = out_dtype or x.dtype
    total = x.astype(jnp.float32)
    if residual is not None:
        total = total + residual.astype(jnp.float32)
    y = _norm(total, weight, bias, eps, rms).astype(out_dtype)
    if prenorm:
        res = total if residual_in_fp32 else total.astype(out_dtype)
        return y, res
    return y


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    return _norm(x.astype(jnp.float32), weight, bias, eps, rms=False).astype(
        x.dtype
    )


def rms_norm(x, weight, eps: float = 1e-5):
    return _norm(x.astype(jnp.float32), weight, None, eps, rms=True).astype(
        x.dtype
    )
