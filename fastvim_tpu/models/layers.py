"""Shared layers/initializers for the model zoo.

Initializers reproduce the reference's init scheme exactly (it is
load-bearing for trainability — SURVEY.md §7.3):

* torch-Linear default (kaiming_uniform a=√5 ⇒ U(±1/√fan_in)) for
  in_proj / x_proj / conv, with zeroed biases (models/fastvim.py:302-305).
* GPT-2 residual rescale for out_proj: torch default / √n_layer
  (models/fastvim.py:309-324).
* dt_proj: weight U(±dt_rank^-0.5·dt_scale); bias = softplus^{-1}(dt) with
  dt ~ LogUniform(dt_min, dt_max) clipped at dt_init_floor
  (mamba_simple_faster.py:110-130).
* A_log = log(1..d_state) per channel; D = 1 (S4D-real init,
  mamba_simple_faster.py:132-144).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def torch_linear_init(fan_in: int, scale: float = 1.0):
    """U(±1/√fan_in) · scale — torch nn.Linear/Conv default kernel init."""
    bound = scale / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dt_proj_kernel_init(dt_rank: int, dt_scale: float = 1.0,
                        dt_init: str = "random"):
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        if dt_init == "constant":
            return jnp.full(shape, std, dtype)
        if dt_init == "random":
            return jax.random.uniform(key, shape, dtype, -std, std)
        raise NotImplementedError(dt_init)

    return init


def dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1,
                 dt_init_floor: float = 1e-4):
    def init(key, shape, dtype=jnp.float32):
        r = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(r * (math.log(dt_max) - math.log(dt_min))
                     + math.log(dt_min))
        dt = jnp.clip(dt, min=dt_init_floor)
        # inverse softplus so that softplus(bias) == dt
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def a_log_init(d_state: int):
    def init(key, shape, dtype=jnp.float32):
        d_inner = shape[0]
        a = jnp.arange(1, d_state + 1, dtype=jnp.float32)
        return jnp.log(jnp.broadcast_to(a, (d_inner, d_state))).astype(dtype)

    return init


def drop_path(x: Array, rate: float, deterministic: bool,
              rng: Optional[Array]) -> Array:
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)
