"""LM head model + incremental generation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models.lm import MambaLMHeadModel, generate


def tiny_lm():
    return MambaLMHeadModel(vocab_size=64, d_model=32, n_layer=2, d_state=4)


def test_lm_forward():
    model = tiny_lm()
    toks = jnp.array([[1, 2, 3, 4, 5]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    logits = model.apply(params, toks)
    assert logits.shape == (1, 5, model.padded_vocab)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_incremental_decode_matches_full_forward():
    """Replaying tokens one-by-one through the cached step reproduces the
    full-sequence logits (the N7/state-update correctness property)."""
    model = tiny_lm()
    toks = jnp.array([[3, 7, 11, 2, 9, 4]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    full = model.apply(params, toks)

    from fastvim_tpu.models.lm import MambaLM

    caches = [MambaLM(d_model=32, d_state=4, n_layer=2).init_cache(1)
              for _ in range(2)]
    outs = []
    for t in range(toks.shape[1]):
        logits, caches = model.apply(params, toks[:, t : t + 1],
                                     caches=caches)
        outs.append(logits[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_fused_prefill_matches_replay():
    """prefill=True (one full forward emitting caches) produces the same
    caches and logits as replaying the prompt token-by-token through the
    cached step — the handoff property the device-side decode loop rests
    on."""
    model = tiny_lm()
    toks = jnp.array([[3, 7, 11, 2, 9, 4], [1, 1, 8, 8, 0, 5]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)

    logits_pre, caches_pre = model.apply(params, toks, prefill=True)

    from fastvim_tpu.models.lm import MambaLM

    caches = [MambaLM(d_model=32, d_state=4, n_layer=2).init_cache(2)
              for _ in range(2)]
    logits = None
    for t in range(toks.shape[1]):
        logits, caches = model.apply(params, toks[:, t: t + 1],
                                     caches=caches)
    np.testing.assert_allclose(np.asarray(logits_pre[:, -1]),
                               np.asarray(logits[:, -1]),
                               rtol=2e-3, atol=2e-3)
    for (cw_p, ss_p), (cw_r, ss_r) in zip(caches_pre, caches):
        np.testing.assert_allclose(np.asarray(cw_p), np.asarray(cw_r),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(ss_p), np.asarray(ss_r),
                                   rtol=2e-3, atol=2e-3)


def test_generate_matches_stepwise_reference():
    """The single-program (prefill + lax.scan) generate reproduces a
    host-loop greedy decode built from the public step API."""
    model = tiny_lm()
    prompt = jnp.array([[5, 2, 9, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)

    out = generate(model, params, prompt, max_new_tokens=5,
                   temperature=0.0)

    logits, caches = model.apply(params, prompt, prefill=True)
    cur = logits[:, -1]
    ref = [prompt]
    for _ in range(5):
        nxt = jnp.argmax(cur, axis=-1)[:, None].astype(jnp.int32)
        ref.append(nxt)
        step_logits, caches = model.apply(params, nxt, caches=caches)
        cur = step_logits[:, -1]
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.concatenate(ref, 1)))


def test_generate_shapes_and_determinism():
    model = tiny_lm()
    prompt = jnp.array([[1, 2, 3]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    out = generate(model, params, prompt, max_new_tokens=4, temperature=0.0)
    assert out.shape == (1, 7)
    out2 = generate(model, params, prompt, max_new_tokens=4,
                    temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_lm_harness_loglikelihood_matches_manual():
    """evals/lm_harness scoring: continuation logprob + is_greedy match a
    hand-computed full-softmax score (the spec of lm_eval loglikelihood;
    adapter mirrors evals/lm_harness_eval.py)."""
    import numpy as np

    from fastvim_tpu.evals import loglikelihood, loglikelihood_rolling
    from fastvim_tpu.models.lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=32, d_model=16, n_layer=2,
                             d_state=4)
    toks = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)

    ctx = [3, 5, 7]
    cont = [2, 9]
    [(ll, greedy)] = loglikelihood(model, params, [(ctx, cont)])

    full = jnp.asarray([ctx + cont], jnp.int32)
    logits = model.apply(params, full[:, :-1])
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    expected = logp[0, 2, 2] + logp[0, 3, 9]
    np.testing.assert_allclose(ll, float(expected), rtol=1e-5)
    exp_greedy = (int(np.argmax(logp[0, 2])) == 2
                  and int(np.argmax(logp[0, 3])) == 9)
    assert greedy == exp_greedy

    # rolling = every token scored, first from the EOT prefix (lm_eval
    # convention; one window when the doc fits)
    [r] = loglikelihood_rolling(model, params, [ctx + cont])
    [(r2, _)] = loglikelihood(model, params, [([0], [3, 5, 7, 2, 9])])
    np.testing.assert_allclose(r, r2, rtol=1e-6)

    # windowed rolling (doc longer than max_seq_len) sums the same
    # disjoint windows scored individually
    doc = [3, 5, 7, 2, 9, 4, 1, 6, 8]
    [rw] = loglikelihood_rolling(model, params, [doc], max_seq_len=4,
                                 prefix_token=0)
    from fastvim_tpu.evals.lm_harness import rolling_windows

    wins = rolling_windows(doc, 4, 0)
    # final partial window keeps the longer disjoint-trimmed context
    assert wins == [([0], [3, 5, 7, 2]), ([2], [9, 4, 1, 6]),
                    ([9, 4, 1, 6], [8])]
    parts = loglikelihood(model, params, wins)
    np.testing.assert_allclose(rw, sum(p for p, _ in parts), rtol=1e-5)

    # batching with ragged lengths agrees with single-pair calls
    pairs = [(ctx, cont), ([1], [4, 6, 8]), ([2, 2, 2, 2, 2], [0])]
    batched = loglikelihood(model, params, pairs, batch_size=3)
    singles = [loglikelihood(model, params, [p])[0] for p in pairs]
    for (a, ga), (b, gb) in zip(batched, singles):
        np.testing.assert_allclose(a, b, rtol=1e-4)
        assert ga == gb


def _oracle_prepare(logits, temperature=1.0, top_k=None, top_p=0.0,
                    repetition_penalty=1.0, seen_tokens=None):
    """Numpy re-derivation of the reference sampler's logit pipeline
    (mamba_ssm/utils/generation.py:36-106): gather/scatter repetition
    penalty over the token list, top-k mask, temperature, ascending
    cumsum top-p removal. Independent of the jax implementation."""
    logits = np.asarray(logits, np.float64).copy()
    if repetition_penalty != 1.0 and seen_tokens is not None:
        for b, toks in enumerate(seen_tokens):
            # torch gathers ALL scores first, then scatters — duplicate
            # indices therefore scatter the same once-penalized value,
            # not a twice-penalized one (generation.py:62-77)
            for t in set(toks):
                s = logits[b, t]
                logits[b, t] = (s * repetition_penalty if s < 0
                                else s / repetition_penalty)
    if top_k is not None and top_k > 0:
        kth = np.sort(logits, axis=-1)[:, -top_k][:, None]
        logits[logits < kth] = -np.inf
    if temperature != 1.0:
        logits = logits / temperature
    if 0.0 < top_p < 1.0:
        srt = np.sort(logits, axis=-1)  # ascending, -infs first
        with np.errstate(invalid="ignore"):
            e = np.exp(srt - np.nanmax(np.where(np.isfinite(srt), srt,
                                                np.nan), axis=-1,
                                       keepdims=True))
        e[~np.isfinite(srt)] = 0.0
        cum = np.cumsum(e / e.sum(-1, keepdims=True), axis=-1)
        remove_sorted = cum <= (1.0 - top_p)
        for b in range(logits.shape[0]):
            removed_vals = srt[b][remove_sorted[b]]
            if removed_vals.size:
                logits[b][logits[b] <= removed_vals.max()] = -np.inf
    return logits


def test_prepare_logits_matches_numpy_oracle():
    """prepare_logits (top-k → temperature → top-p, CTRL repetition
    penalty via presence mask) matches an independent numpy oracle of
    the reference semantics on random tie-free logits, across the
    config grid."""
    from fastvim_tpu.models.lm import prepare_logits

    rng = np.random.default_rng(7)
    V, B = 97, 3
    logits = rng.normal(size=(B, V)).astype(np.float32) * 3.0
    seen_tokens = [[1, 5, 5, 90], [0], list(range(20))]
    seen = np.zeros((B, V), bool)
    for b, ts in enumerate(seen_tokens):
        seen[b, ts] = True

    for temp in (1.0, 0.7):
        for top_k in (None, 10, 1):
            for top_p in (0.0, 0.9, 0.5):
                for pen in (1.0, 1.3):
                    got = np.asarray(prepare_logits(
                        jnp.asarray(logits), temp, top_k, top_p, pen,
                        jnp.asarray(seen)))
                    want = _oracle_prepare(logits, temp, top_k, top_p,
                                           pen, seen_tokens)
                    finite = np.isfinite(want)
                    assert (np.isfinite(got) == finite).all(), (
                        temp, top_k, top_p, pen)
                    np.testing.assert_allclose(
                        got[finite], want[finite], rtol=2e-5,
                        err_msg=str((temp, top_k, top_p, pen)))


def test_generate_repetition_penalty_and_topp_run():
    """End-to-end generate with the full sampling surface: shapes hold,
    a huge repetition penalty on a tiny vocab visibly suppresses
    repeats vs penalty-free sampling, and eos pinning freezes rows."""
    model = tiny_lm()
    prompt = jnp.array([[5, 2, 9, 1], [3, 3, 3, 3]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)

    out = generate(model, params, prompt, max_new_tokens=6,
                   temperature=1.0, top_k=8, top_p=0.9,
                   repetition_penalty=1.2, rng=jax.random.PRNGKey(4))
    assert out.shape == (2, 10)
    assert np.asarray(out[:, :4] == prompt).all()

    # greedy short-circuit: top_k=1 ignores temperature (reference
    # sample() argmaxes before anything else, generation.py:84-85)
    g1 = generate(model, params, prompt, max_new_tokens=4,
                  temperature=5.0, top_k=1)
    g2 = generate(model, params, prompt, max_new_tokens=4,
                  temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_generate_eos_pins_tail():
    """Once a row samples eos, every later position is eos (the static
    -shape analogue of the reference's all-eos host-loop stop)."""
    model = tiny_lm()
    prompt = jnp.array([[5, 2, 9, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt)
    eos = int(np.asarray(
        generate(model, params, prompt, 1, temperature=0.0))[0, -1])
    # greedy with eos = the first generated token → whole tail pinned
    out = generate(model, params, prompt, max_new_tokens=5,
                   temperature=0.0, eos_token_id=eos)
    tail = np.asarray(out)[0, 4:]
    assert tail[0] == eos
    assert (tail == eos).all()
