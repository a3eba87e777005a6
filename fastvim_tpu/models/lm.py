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

import functools
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
    def __call__(self, x: Array, cache: Optional[Tuple] = None,
                 return_cache: bool = False):
        """x: (batch, L, d_model). With ``cache`` (conv_state, ssm_state),
        L must be 1 (incremental decode); returns (out, new_cache).
        ``return_cache`` on the full-sequence path is the FUSED PREFILL:
        one forward that also emits the decode cache (conv window = last
        d_conv pre-conv activations, ssm state = the scan's last state) —
        the reference stores the same via ``inference_params`` during its
        prompt forward (mamba_simple.py forward + generation.py)."""
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
            if return_cache:
                y, last = selective_scan(
                    xc, dt, A, Bm, Cm, D=D, z=z, delta_bias=dt_b,
                    delta_softplus=True, return_last_state=True)
                L = xin.shape[1]
                win = xin[:, max(L - self.d_conv, 0):].astype(jnp.float32)
                if L < self.d_conv:
                    win = jnp.pad(
                        win, ((0, 0), (self.d_conv - L, 0), (0, 0)))
                new_cache = (win, last.astype(jnp.float32))
            else:
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
    def __call__(self, tokens: Array, caches=None, prefill: bool = False):
        """tokens (batch, L) int32 → logits (batch, L, vocab).
        With ``caches`` (list per layer), incremental decode (L==1).
        ``prefill=True``: full-sequence forward that also returns the
        per-layer decode caches (fused prefill — one pass, no replay)."""
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
            )(hidden, None if caches is None else caches[i],
              return_cache=prefill)
            new_caches.append(cache)
        w = self.param("norm_f_weight", nn.initializers.ones,
                       (self.d_model,))
        hidden = add_norm(hidden, w, None, residual=residual,
                          prenorm=False, rms=self.rms_norm,
                          eps=self.norm_eps, out_dtype=self.dtype)
        logits = emb.attend(hidden.astype(emb.embedding.dtype))
        if caches is not None or prefill:
            return logits, new_caches
        return logits


def prepare_logits(logits: Array, temperature: float = 1.0,
                   top_k: Optional[int] = None, top_p: float = 0.0,
                   repetition_penalty: float = 1.0,
                   seen: Optional[Array] = None) -> Array:
    """Logit pipeline matching the reference sampler's semantics
    (`mamba_ssm/utils/generation.py:45-106`), factored out so tests can
    lock it against a numpy oracle:

    1. CTRL-style repetition penalty over every token seen so far —
       prompt AND generated (generation.py:220-224 penalizes
       ``sequences_cat``): negative scores ×penalty, positive ÷penalty.
       The reference gathers/scatters the (growing, dynamic-length)
       token list; the static-shape TPU form is a carried per-batch
       vocab PRESENCE MASK ``seen`` (bool (batch, vocab)) — scatter of
       duplicate indices writes identical values, so mask semantics are
       exactly equivalent.
    2. top-k to -inf (generation.py:37-40).
    3. temperature (applied after top-k selection, before top-p, as in
       generation.py sample(): monotonic, so k-selection is unaffected).
    4. nucleus/top-p: ascending-sorted cumulative softmax ≤ (1-p)
       removed (generation.py:45-58). Removal is a prefix of the sorted
       order, so it reduces to a per-row value threshold — no scatter.
       With both k and p set, p filters within the k survivors (the
       documented "top-k applied first, then top-p", generation.py:129).

    Returns fp32 logits ready for `jax.random.categorical`.
    """
    logits = logits.astype(jnp.float32)
    if repetition_penalty != 1.0 and seen is not None:
        penalized = jnp.where(logits < 0, logits * repetition_penalty,
                              logits / repetition_penalty)
        logits = jnp.where(seen, penalized, logits)
    if top_k is not None and top_k > 0:
        vals = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0]
        logits = jnp.where(logits < vals[..., -1:], -jnp.inf, logits)
    if temperature != 1.0:
        logits = logits / temperature
    if 0.0 < top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)                      # ascending
        cum = jnp.cumsum(jax.nn.softmax(srt, axis=-1), axis=-1)
        kept = cum > (1.0 - top_p)    # suffix; top-1 always kept
        thresh = jnp.min(jnp.where(kept, srt, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return logits


@functools.lru_cache(maxsize=32)
def _decode_program(model: MambaLMHeadModel, max_new_tokens: int,
                    temperature: float, top_k: Optional[int],
                    top_p: float, repetition_penalty: float,
                    eos_token_id: Optional[int]):
    """One compiled program: fused prefill + a ``lax.scan`` decode loop.

    The whole generation is a single device program — the TPU-native
    equivalent of the reference's CUDA-graph-captured steady state
    (generation.py:282-…): no host round trip per token (critical through
    remote-execution relays, where each dispatch costs a network hop).
    Keyed on the (hashable) module + static sampling config. Static
    trace-time branching keeps unused features (penalty mask, eos done
    flags) out of the scan carry entirely.
    """
    use_pen = repetition_penalty != 1.0
    greedy = temperature == 0.0 or top_k == 1   # generation.py:84

    def sample(logits, key, seen):
        if greedy:
            return jnp.argmax(logits, axis=-1)
        prepped = prepare_logits(logits, temperature, top_k, top_p,
                                 repetition_penalty, seen)
        return jax.random.categorical(key, prepped, axis=-1)

    def run(params, prompt, rng):
        logits_all, caches = model.apply(params, prompt, prefill=True)
        vocab = logits_all.shape[-1]
        seen0 = None
        if use_pen:
            seen0 = jnp.zeros((prompt.shape[0], vocab), jnp.bool_)
            seen0 = seen0.at[
                jnp.arange(prompt.shape[0])[:, None], prompt].set(True)
        done0 = (None if eos_token_id is None
                 else jnp.zeros((prompt.shape[0],), jnp.bool_))

        def body(carry, _):
            logits, caches, key, seen, done = carry
            key, sub = jax.random.split(key)
            nxt = sample(logits, sub, seen)
            if eos_token_id is not None:
                # static shapes forbid early exit; the reference stops
                # the host loop on all-eos (generation.py:200-206) — we
                # pin every post-eos position to eos instead.
                nxt = jnp.where(done, eos_token_id, nxt)
                done = done | (nxt == eos_token_id)
            if use_pen:
                seen = seen.at[jnp.arange(nxt.shape[0]), nxt].set(True)
            step_logits, caches = model.apply(
                params, nxt[:, None].astype(prompt.dtype), caches=caches)
            return (step_logits[:, -1], caches, key, seen, done), nxt

        _, toks = jax.lax.scan(
            body, (logits_all[:, -1], caches, rng, seen0, done0),
            None, length=max_new_tokens)
        return toks.T.astype(prompt.dtype)           # (batch, T)

    return jax.jit(run)


def generate(model: MambaLMHeadModel, params, prompt: Array,
             max_new_tokens: int, temperature: float = 1.0,
             top_k: Optional[int] = None, top_p: float = 0.0,
             repetition_penalty: float = 1.0,
             eos_token_id: Optional[int] = None,
             rng: Optional[Array] = None):
    """Greedy/top-k/top-p sampling with repetition penalty and eos
    pinning, over a carried per-layer cache — the full sampling surface
    of the reference's `utils/generation.py` decode().

    Fused prefill (one full-sequence forward that also emits the caches)
    followed by an on-device ``lax.scan`` over single-token steps — the
    entire generation is ONE jit program (vs the reference's CUDA-graph
    steady state with a host loop, generation.py:282-…).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    fn = _decode_program(model, int(max_new_tokens), float(temperature),
                         None if top_k is None else int(top_k),
                         float(top_p), float(repetition_penalty),
                         None if eos_token_id is None else int(eos_token_id))
    toks = fn(params, prompt, rng)
    return jnp.concatenate([prompt, toks], axis=1)
