"""Mamba language model + autoregressive generation (inherited extras).

TPU-native port of the reference LM stack
(`mamba-1p1p1/mamba_ssm/models/mixer_seq_simple.py` MambaLMHeadModel,
`mamba_ssm/utils/generation.py` GenerationMixin.decode): a stack of
unidirectional Mamba mixer blocks with tied embeddings, plus jit-compiled
incremental decoding over a carried (conv_state, ssm_state) cache — the
TPU answer to the reference's CUDA-graph-captured per-token step
(generation.py:270-…): one compiled `lax.scan`/step function re-used for
every token, states in device memory.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.models.layers import (
    a_log_init,
    dt_bias_init,
    dt_proj_kernel_init,
    torch_linear_init,
)
from fastvim_tpu.ops import (
    add_norm,
    causal_conv1d,
    causal_conv1d_update,
    selective_scan,
    selective_state_update,
)

Array = jax.Array


class MambaLM(nn.Module):
    """Unidirectional Mamba mixer (mamba_simple.Mamba without the reverse
    branch/z-after-norm vision additions) — the LM block body."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Any = "auto"
    n_layer: int = 24
    dtype: Any = jnp.float32

    @property
    def d_inner(self):
        return int(self.expand * self.d_model)

    @property
    def dt_rank_(self):
        return (-(-self.d_model // 16) if self.dt_rank == "auto"
                else int(self.dt_rank))

    def _params(self):
        d_inner, n, r = self.d_inner, self.d_state, self.dt_rank_
        conv_w = self.param("conv1d_weight", torch_linear_init(self.d_conv),
                            (self.d_conv, d_inner))
        conv_b = self.param("conv1d_bias", torch_linear_init(self.d_conv),
                            (d_inner,))
        x_proj = self.param("x_proj_weight", torch_linear_init(d_inner),
                            (d_inner, r + 2 * n))
        dt_w = self.param("dt_proj_weight", dt_proj_kernel_init(r),
                          (r, d_inner))
        dt_b = self.param("dt_proj_bias", dt_bias_init(), (d_inner,))
        A_log = self.param("A_log", a_log_init(n), (d_inner, n))
        D = self.param("D", nn.initializers.ones, (d_inner,))
        return conv_w, conv_b, x_proj, dt_w, dt_b, A_log, D

    @nn.compact
    def __call__(self, x: Array, cache: Optional[Tuple] = None):
        """x: (batch, L, d_model). With ``cache`` (conv_state, ssm_state),
        L must be 1 (incremental decode); returns (out, new_cache)."""
        d_inner, n, r = self.d_inner, self.d_state, self.dt_rank_
        dtype = self.dtype
        xz = nn.Dense(2 * d_inner, use_bias=False,
                      kernel_init=torch_linear_init(self.d_model),
                      dtype=dtype, name="in_proj")(x.astype(dtype))
        xin, z = xz[..., :d_inner], xz[..., d_inner:]
        conv_w, conv_b, x_proj, dt_w, dt_b, A_log, D = self._params()
        A = -jnp.exp(A_log.astype(jnp.float32))

        if cache is None:
            xc = causal_conv1d(xin, conv_w.astype(dtype),
                               conv_b.astype(dtype))
            dbl = jnp.dot(xc, x_proj.astype(dtype))
            dt = jnp.dot(dbl[..., :r], dt_w.astype(dtype))
            Bm, Cm = dbl[..., r:r + n], dbl[..., r + n:]
            y = selective_scan(xc, dt, A, Bm, Cm, D=D, z=z,
                               delta_bias=dt_b, delta_softplus=True)
            new_cache = None
        else:
            conv_state, ssm_state = cache
            x1 = xin[:, 0]
            yc, conv_state = causal_conv1d_update(
                x1, conv_state, conv_w.astype(dtype), conv_b.astype(dtype))
            dbl = jnp.dot(yc, x_proj.astype(dtype))
            dt = jnp.dot(dbl[..., :r], dt_w.astype(dtype))
            Bm, Cm = dbl[..., r:r + n], dbl[..., r + n:]
            y1, ssm_state = selective_state_update(
                ssm_state, yc, dt, A, Bm, Cm, D=D, z=z[:, 0],
                dt_bias=dt_b, dt_softplus=True)
            y = y1[:, None]
            new_cache = (conv_state, ssm_state)

        out = nn.Dense(self.d_model, use_bias=False,
                       kernel_init=torch_linear_init(
                           d_inner, scale=1 / math.sqrt(self.n_layer)),
                       dtype=dtype, name="out_proj")(y)
        return out, new_cache

    def init_cache(self, batch: int):
        return (jnp.zeros((batch, self.d_conv, self.d_inner)),
                jnp.zeros((batch, self.d_inner, self.d_state)))


class MambaLMHeadModel(nn.Module):
    """Embedding → n_layer × (add-norm → MambaLM) → norm → tied LM head
    (mixer_seq_simple.py:MambaLMHeadModel)."""

    vocab_size: int = 50277
    d_model: int = 768
    n_layer: int = 24
    d_state: int = 16
    rms_norm: bool = True
    norm_eps: float = 1e-5
    pad_vocab_multiple: int = 8
    dtype: Any = jnp.float32

    @property
    def padded_vocab(self):
        m = self.pad_vocab_multiple
        return ((self.vocab_size + m - 1) // m) * m

    @nn.compact
    def __call__(self, tokens: Array, caches=None):
        """tokens (batch, L) int32 → logits (batch, L, vocab).
        With ``caches`` (list per layer), incremental decode (L==1)."""
        emb = nn.Embed(self.padded_vocab, self.d_model,
                       embedding_init=nn.initializers.normal(0.02),
                       name="embedding")
        hidden = emb(tokens).astype(self.dtype)
        residual = None
        new_caches = []
        for i in range(self.n_layer):
            w = self.param(f"norm_{i}_weight", nn.initializers.ones,
                           (self.d_model,))
            hidden, residual = add_norm(
                hidden, w, None, residual=residual, prenorm=True,
                rms=self.rms_norm, eps=self.norm_eps,
                out_dtype=self.dtype)
            hidden, cache = MambaLM(
                d_model=self.d_model, d_state=self.d_state,
                n_layer=self.n_layer, dtype=self.dtype,
                name=f"layers_{i}",
            )(hidden, None if caches is None else caches[i])
            new_caches.append(cache)
        w = self.param("norm_f_weight", nn.initializers.ones,
                       (self.d_model,))
        hidden = add_norm(hidden, w, None, residual=residual,
                          prenorm=False, rms=self.rms_norm,
                          eps=self.norm_eps, out_dtype=self.dtype)
        logits = emb.attend(hidden.astype(emb.embedding.dtype))
        if caches is not None:
            return logits, new_caches
        return logits


def generate(model: MambaLMHeadModel, params, prompt: Array,
             max_new_tokens: int, temperature: float = 1.0,
             top_k: Optional[int] = None, rng: Optional[Array] = None):
    """Greedy/top-k sampling with a carried per-layer cache.

    The prefill runs the full-sequence path once; each subsequent token
    reuses one compiled single-token step (the reference achieves the same
    steady-state with CUDA-graph capture, generation.py:282-…).
    """
    batch, L = prompt.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # prefill: full forward, then replay prompt through the step fn to
    # build caches (simple and correct; a fused prefill is an optimization)
    caches = [
        MambaLM(d_model=model.d_model, d_state=model.d_state,
                n_layer=model.n_layer).init_cache(batch)
        for _ in range(model.n_layer)
    ]

    @jax.jit
    def step(params, tok, caches):
        logits, caches = model.apply(params, tok, caches=caches)
        return logits[:, -1], caches

    logits = None
    for t in range(L):
        logits, caches = step(params, prompt[:, t : t + 1], caches)

    tokens = [prompt]
    cur = None
    for i in range(max_new_tokens):
        if cur is not None:
            logits, caches = step(params, cur, caches)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, axis=-1)
        else:
            scaled = logits / temperature
            if top_k is not None:
                thresh = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
                scaled = jnp.where(scaled < thresh, -jnp.inf, scaled)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, scaled, axis=-1)
        cur = nxt[:, None].astype(prompt.dtype)
        tokens.append(cur)
    return jnp.concatenate(tokens, axis=1)
