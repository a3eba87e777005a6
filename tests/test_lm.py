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

    # rolling = loglikelihood of t[1:] given t[:1]
    [r] = loglikelihood_rolling(model, params, [ctx + cont])
    [(r2, _)] = loglikelihood(model, params, [([3], [5, 7, 2, 9])])
    np.testing.assert_allclose(r, r2, rtol=1e-6)

    # batching with ragged lengths agrees with single-pair calls
    pairs = [(ctx, cont), ([1], [4, 6, 8]), ([2, 2, 2, 2, 2], [0])]
    batched = loglikelihood(model, params, pairs, batch_size=3)
    singles = [loglikelihood(model, params, [p])[0] for p in pairs]
    for (a, ga), (b, gb) in zip(batched, singles):
        np.testing.assert_allclose(a, b, rtol=1e-4)
        assert ga == gb
