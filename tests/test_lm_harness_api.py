"""API-shape coverage for the lm-eval-harness adapter (VERDICT r3 #10).

`lm_eval` is not installed in this environment, so ``make_eval_wrapper``
(the one adapter in the tree that talks to an external package API) is
exercised here against a vendored minimal stub of ``lm_eval.api`` that
mirrors the real package's contract (ref:
mamba-1p1p1/evals/lm_harness_eval.py): an abstract ``LM`` base requiring
loglikelihood / loglikelihood_rolling / generate_until, a
``register_model(name)(cls)`` decorator, and request objects exposing
``.args``. Catches drift in the wrapper's method surface without the
dependency."""

import abc
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class _FakeLM(abc.ABC):
    """Mirrors lm_eval.api.model.LM's abstract surface."""

    def __init__(self):
        pass

    @abc.abstractmethod
    def loglikelihood(self, requests):
        ...

    @abc.abstractmethod
    def loglikelihood_rolling(self, requests):
        ...

    @abc.abstractmethod
    def generate_until(self, requests):
        ...


_REGISTRY = {}


def _register_model(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


class _Request:
    """lm_eval.api.instance.Instance look-alike: .args tuple."""

    def __init__(self, *args):
        self.args = args


class _CharTokenizer:
    """Tiny deterministic tokenizer: one token per character."""

    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % 60 + 1 for c in s]

    def decode(self, ids):
        return "".join(chr((i - 1) % 60 + 97) for i in ids)


@pytest.fixture
def fake_lm_eval(monkeypatch):
    pkg = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")
    reg_mod = types.ModuleType("lm_eval.api.registry")
    model_mod.LM = _FakeLM
    reg_mod.register_model = _register_model
    api.model = model_mod
    api.registry = reg_mod
    pkg.api = api
    for name, mod in [("lm_eval", pkg), ("lm_eval.api", api),
                      ("lm_eval.api.model", model_mod),
                      ("lm_eval.api.registry", reg_mod)]:
        monkeypatch.setitem(sys.modules, name, mod)
    _REGISTRY.clear()
    return pkg


def test_wrapper_against_api_stub(fake_lm_eval):
    from fastvim_tpu.evals.lm_harness import (
        loglikelihood as ll_direct,
        make_eval_wrapper,
    )
    from fastvim_tpu.models.lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=64, d_model=32, n_layer=2,
                             d_state=4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))
    tok = _CharTokenizer()
    cls = make_eval_wrapper(model, params, tok, max_length=64,
                            batch_size=4)

    # registered under the adapter's public name, instantiable (i.e. all
    # abstract methods of the real LM surface are implemented)
    assert _REGISTRY["fastvim_mamba"] is cls
    lm = cls()

    # loglikelihood: (ctx, cont) string requests -> [(float, bool)]
    reqs = [_Request("hello", " world"), _Request("abc", "def"),
            _Request("", "x")]  # empty context exercises the EOS fill
    out = lm.loglikelihood(reqs)
    assert len(out) == 3
    for ll, greedy in out:
        assert isinstance(ll, float) and np.isfinite(ll)
        assert isinstance(greedy, bool)
    # matches the standalone primitive on the same token pairs
    pairs = [(tok.encode("hello"), tok.encode(" world"))]
    direct = ll_direct(model, params, pairs)
    assert abs(direct[0][0] - out[0][0]) < 1e-3

    # loglikelihood_rolling: [str] -> [float]
    rolls = lm.loglikelihood_rolling([_Request("rolling text")])
    assert len(rolls) == 1 and np.isfinite(rolls[0])

    # generate_until: (ctx, {until, max_gen_toks}) -> [str], stop strings
    # applied
    gens = lm.generate_until(
        [_Request("ab", {"until": ["q"], "max_gen_toks": 4})])
    assert len(gens) == 1 and isinstance(gens[0], str)
    assert "q" not in gens[0]


def test_wrapper_import_error_without_lm_eval(monkeypatch):
    for name in list(sys.modules):
        if name.startswith("lm_eval"):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setattr("builtins.__import__", __import_blocking__,
                        raising=True)
    from fastvim_tpu.evals.lm_harness import make_eval_wrapper

    with pytest.raises(ImportError, match="lm_eval is not installed"):
        make_eval_wrapper(None, None, None)


_real_import = __import__


def __import_blocking__(name, *a, **kw):
    if name.startswith("lm_eval"):
        raise ImportError(name)
    return _real_import(name, *a, **kw)


def _lm_eval_rolling_oracle(token_list, prefix_token, max_seq_len,
                            context_len=1):
    """Independent re-derivation of lm_eval's
    ``get_rolling_token_windows`` + ``make_disjoint_window`` pipeline
    (the spec our ``rolling_windows`` must match): first window predicts
    min(max_seq_len, n) tokens from the prefix token; later windows
    predict chunks of (max_seq_len - context_len + 1) tokens; the
    disjoint transform then trims each context to the tokens not
    re-predicted."""
    if not token_list:
        return
    pred_len = max_seq_len - context_len + 1
    first = min(max_seq_len, len(token_list))
    windows = [([prefix_token] + token_list[: first - 1],
                token_list[:first])]
    predicted = first
    while predicted < len(token_list):
        plen = min(len(token_list) - predicted, pred_len)
        end = predicted + plen
        windows.append((token_list[end - max_seq_len - 1: end - 1],
                        token_list[end - plen: end]))
        predicted = end
    for a, b in windows:
        trimmed = a[: len(a) - (len(b) - 1)] if len(b) > 1 else a
        yield trimmed, b


def test_rolling_windows_match_lm_eval_pipeline():
    from fastvim_tpu.evals.lm_harness import rolling_windows

    for n in (0, 1, 3, 4, 5, 8, 9, 17):
        doc = list(range(10, 10 + n))
        for max_len in (1, 2, 4, 7):
            got = rolling_windows(doc, max_len, 99)
            want = list(_lm_eval_rolling_oracle(doc, 99, max_len))
            assert got == want, (n, max_len, got, want)
            # invariant: every token predicted exactly once, in order
            flat = [t for _, cont in got for t in cont]
            assert flat == doc


def test_wrapper_rolling_scores_full_document(fake_lm_eval):
    """A doc LONGER than max_length is scored in full via rolling
    windows (VERDICT r4 #8's 'rolling-loglikelihood windows'), not
    silently truncated: the wrapper's answer equals the standalone
    windowed primitive on the same tokens."""
    from fastvim_tpu.evals.lm_harness import (
        loglikelihood_rolling as roll_direct,
        make_eval_wrapper,
    )
    from fastvim_tpu.models.lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=64, d_model=32, n_layer=2,
                             d_state=4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))
    tok = _CharTokenizer()
    lm = make_eval_wrapper(model, params, tok, max_length=8,
                           batch_size=4)()

    text = "a much longer rolling document"   # 30 chars >> max_length 8
    [got] = lm.loglikelihood_rolling([_Request(text)])
    [want] = roll_direct(model, params, [tok.encode(text)],
                         max_seq_len=8, prefix_token=tok.eos_token_id)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_generate_until_full_surface(fake_lm_eval):
    """generate_until contract edges: several stop strings (earliest
    applies), missing kwargs fall back to defaults, and batch of
    requests preserves order/length."""
    from fastvim_tpu.evals.lm_harness import make_eval_wrapper
    from fastvim_tpu.models.lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=64, d_model=32, n_layer=2,
                             d_state=4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))
    tok = _CharTokenizer()
    lm = make_eval_wrapper(model, params, tok, max_length=32,
                           batch_size=2)()

    full = lm.generate_until([_Request("ab", {"max_gen_toks": 6})])[0]
    assert isinstance(full, str) and len(full) == 6
    if len(full) > 2:
        stops = [full[2], full[1]]
        cut = lm.generate_until(
            [_Request("ab", {"until": stops, "max_gen_toks": 6})])[0]
        for s in stops:
            assert s not in cut
        assert full.startswith(cut)

    outs = lm.generate_until(
        [_Request("ab", {"max_gen_toks": 3}),
         _Request("cd", {"max_gen_toks": 5})])
    assert [len(o) for o in outs] == [3, 5]
