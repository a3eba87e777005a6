"""lm-evaluation-harness adapter for the JAX MambaLMHeadModel.

TPU-native counterpart of the reference's
`mamba-1p1p1/evals/lm_harness_eval.py` (a thin HFLM wrapper around the
torch MambaLMHeadModel). The scoring primitives here are standalone,
jit-compiled and testable without lm_eval installed;
``make_eval_wrapper`` builds the registered lm_eval ``LM`` subclass
lazily when the harness package is available.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _pad_batch(seqs: Sequence[np.ndarray], pad_id: int = 0,
               bucket: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Right-pad int sequences to a common bucketed length (multiples of
    ``bucket`` — bounds the number of distinct jit shapes; first compiles
    through the TPU relay cost minutes, CLAUDE.md)."""
    L = max(max(len(s) for s in seqs), 2)
    L = ((L + bucket - 1) // bucket) * bucket
    out = np.full((len(seqs), L), pad_id, np.int32)
    lens = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return out, lens


_SCORE_CACHE: dict = {}


def _score_fn(model):
    """Jitted scorer, cached per model CONFIG (flax modules are frozen
    hashable dataclasses) so repeated calls — even with freshly
    constructed but identical models — reuse compiled executables, and
    the cache stays bounded by the number of distinct configs."""
    key = model
    if key in _SCORE_CACHE:
        return _SCORE_CACHE[key]

    @jax.jit
    def score(params, tokens, ctx_lens, total_lens):
        """Per-row log-likelihood of tokens[ctx_len:total_len] given the
        prefix, plus whether the continuation is the greedy decode."""
        logits = model.apply(params, tokens[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        targets = tokens[:, 1:]
        tok_lp = jnp.take_along_axis(logp, targets[..., None],
                                     axis=-1)[..., 0]
        pos = jnp.arange(targets.shape[1])[None, :]
        # continuation tokens are predictions at positions
        # [ctx_len-1, total_len-1) of the shifted sequence
        mask = (pos >= ctx_lens[:, None] - 1) & \
            (pos < total_lens[:, None] - 1)
        ll = jnp.sum(tok_lp * mask, axis=1)
        greedy = jnp.argmax(logp, axis=-1) == targets
        is_greedy = jnp.all(jnp.where(mask, greedy, True), axis=1)
        return ll, is_greedy

    _SCORE_CACHE[key] = score
    return score


def loglikelihood(model, params, pairs: Sequence[Tuple[Sequence[int],
                                                       Sequence[int]]],
                  batch_size: int = 16) -> List[Tuple[float, bool]]:
    """lm_eval ``loglikelihood``: pairs of (context_tokens,
    continuation_tokens) → [(sum logprob of continuation, is_greedy)].
    """
    score = _score_fn(model)
    results: List[Tuple[float, bool]] = []
    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i:i + batch_size]
        seqs = [np.asarray(list(c) + list(x), np.int32)
                for c, x in chunk]
        ctx_lens = np.asarray([max(len(c), 1) for c, _ in chunk],
                              np.int32)
        tokens, total = _pad_batch(seqs)
        ll, greedy = score(params, jnp.asarray(tokens),
                           jnp.asarray(ctx_lens), jnp.asarray(total))
        results.extend((float(a), bool(b))
                       for a, b in zip(np.asarray(ll), np.asarray(greedy)))
    return results


def rolling_windows(tokens: Sequence[int], max_seq_len: int,
                    prefix_token: int) -> List[Tuple[List[int],
                                                     List[int]]]:
    """Split a document into the harness's rolling prediction windows:
    lm_eval's ``get_rolling_token_windows(..., context_len=1)`` composed
    with ``make_disjoint_window`` — every token of the document is
    predicted exactly once; the first window conditions on the EOT
    prefix token, each full later window on the single token before it,
    and the final partial window keeps the longer trimmed context the
    disjoint transform leaves (tokens [end-max-1, end-plen))."""
    toks = list(tokens)
    n = len(toks)
    if n == 0:
        return []
    first = min(max_seq_len, n)
    out = [([prefix_token], toks[:first])]
    done = first
    while done < n:
        plen = min(n - done, max_seq_len)
        end = done + plen
        out.append((toks[end - max_seq_len - 1:end - plen],
                    toks[end - plen:end]))
        done = end
    return out


def loglikelihood_rolling(model, params,
                          token_lists: Sequence[Sequence[int]],
                          batch_size: int = 16,
                          max_seq_len: Optional[int] = None,
                          prefix_token: int = 0) -> List[float]:
    """lm_eval ``loglikelihood_rolling``: log-likelihood of EVERY token
    of each document (the first predicted from ``prefix_token``, the
    harness's EOT convention), summed over disjoint rolling windows of
    at most ``max_seq_len`` predictions (all-in-one-window when None) —
    documents longer than the model context are scored in full, not
    truncated."""
    pairs: List[Tuple[List[int], List[int]]] = []
    spans: List[Tuple[int, int]] = []
    for t in token_lists:
        wins = rolling_windows(t, max_seq_len or max(len(t), 1),
                               prefix_token)
        spans.append((len(pairs), len(pairs) + len(wins)))
        pairs.extend(wins)
    lls = loglikelihood(model, params, pairs, batch_size)
    return [float(sum(ll for ll, _ in lls[a:b])) for a, b in spans]


def make_eval_wrapper(model, params, tokenizer, max_length: int = 2048,
                      batch_size: int = 16):
    """Build (and register) the lm_eval LM subclass. Requires the
    ``lm_eval`` package (not bundled); raises ImportError with guidance
    otherwise. Mirrors evals/lm_harness_eval.py:MambaEvalWrapper."""
    try:
        from lm_eval.api.model import LM
        from lm_eval.api.registry import register_model
    except ImportError as e:  # pragma: no cover - env without lm_eval
        raise ImportError(
            "lm_eval is not installed; the scoring primitives "
            "(loglikelihood / loglikelihood_rolling) work standalone"
        ) from e

    class MambaEvalWrapper(LM):
        def __init__(self):
            super().__init__()
            self.tokenizer = tokenizer
            self._max_length = max_length

        def _enc(self, s):
            return self.tokenizer.encode(s)

        def loglikelihood(self, requests):
            pairs = []
            for req in requests:
                ctx, cont = req.args
                c = self._enc(ctx) or [getattr(self.tokenizer,
                                               "eos_token_id", 0)]
                x = self._enc(cont)
                pairs.append((c[-self._max_length:], x))
            return loglikelihood(model, params, pairs, batch_size)

        def loglikelihood_rolling(self, requests):
            toks = [self._enc(req.args[0]) for req in requests]
            return loglikelihood_rolling(
                model, params, toks, batch_size,
                max_seq_len=self._max_length,
                prefix_token=getattr(self.tokenizer, "eos_token_id", 0))

        def generate_until(self, requests):
            from fastvim_tpu.models.lm import generate

            outs = []
            for req in requests:
                ctx, kwargs = req.args
                until = kwargs.get("until", [])
                max_new = kwargs.get("max_gen_toks", 128)
                prompt = jnp.asarray(
                    [self._enc(ctx)[-self._max_length:]], jnp.int32)
                toks = generate(model, params, prompt, max_new,
                                temperature=0.0)
                text = self.tokenizer.decode(
                    np.asarray(toks[0, prompt.shape[1]:]).tolist())
                for stop in until:
                    text = text.split(stop)[0]
                outs.append(text)
            return outs

    register_model("fastvim_mamba")(MambaEvalWrapper)
    return MambaEvalWrapper
