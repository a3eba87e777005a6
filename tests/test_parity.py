"""Mixer-level parity vs an independent numpy reproduction of the
reference FastVim mixer math (mamba_simple_faster.py:181-457):

    in_proj → split x/z → [per direction: causal conv+silu → mean-pool
    cols → x_proj → dt_proj → selective scan → repeat-interleave →
    + D·conv_out] → merge LN((fwd+rev)/2)·silu(z) → out_proj

The numpy model consumes the flax params directly, so this checks both
the math and the parameter wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models.mixer import MambaMixer


def np_silu(x):
    return x / (1 + np.exp(-x))


def np_softplus(x):
    return np.logaddexp(0.0, x)


def np_causal_conv(x, w, b):
    # x (B, L, d), w (width, d)
    width = w.shape[0]
    xp = np.pad(x, ((0, 0), (width - 1, 0), (0, 0)))
    y = np.zeros_like(x)
    for t in range(x.shape[1]):
        y[:, t] = (xp[:, t:t + width] * w[None]).sum(1)
    return np_silu(y + b[None, None])


def np_scan(u, delta, A, B, C, bias):
    # u (B, L, d); A (d, n); B, C (B, L, n)
    delta = np_softplus(delta + bias[None, None])
    batch, L, d = u.shape
    h = np.zeros((batch, d, A.shape[1]))
    ys = np.zeros((batch, L, d))
    for t in range(L):
        h = (np.exp(delta[:, t, :, None] * A[None]) * h
             + delta[:, t, :, None] * B[:, t][:, None, :]
             * u[:, t, :, None])
        ys[:, t] = np.einsum("bdn,bn->bd", h, C[:, t])
    return ys


def np_mixer(params, x, rows, cols, d_state, dt_rank, pooled=True,
             scaling=1.0):
    pd = params["params"]
    xz = x @ np.asarray(pd["in_proj"]["kernel"])
    d_inner = xz.shape[-1] // 2
    xin, z = xz[..., :d_inner], xz[..., d_inner:]

    def branch(xb, suffix):
        conv_w = np.asarray(pd[f"conv1d{suffix}_weight"])
        conv_b = np.asarray(pd[f"conv1d{suffix}_bias"])
        xc = np_causal_conv(xb, conv_w, conv_b)
        if pooled:
            xp = xc.reshape(xb.shape[0], rows, cols, d_inner).mean(2)
            if scaling != 1.0:
                xp = xp * scaling
        else:
            xp = xc
        dbl = xp @ np.asarray(pd[f"x_proj{suffix}_weight"])
        dt = dbl[..., :dt_rank] @ np.asarray(pd[f"dt_proj{suffix}_weight"])
        Bm = dbl[..., dt_rank:dt_rank + d_state]
        Cm = dbl[..., dt_rank + d_state:]
        A = -np.exp(np.asarray(pd[f"A{suffix}_log"]))
        y = np_scan(xp, dt, A, Bm, Cm,
                    np.asarray(pd[f"dt_proj{suffix}_bias"]))
        if pooled:
            y = np.repeat(y, cols, axis=1)
        return y + np.asarray(pd[f"D{suffix}"])[None, None] * xc

    y_f = branch(xin, "")
    y_b = branch(xin[:, ::-1], "_b")[:, ::-1]
    merged = (y_f + y_b) / 2
    mu = merged.mean(-1, keepdims=True)
    var = merged.var(-1, keepdims=True)
    merged = ((merged - mu) / np.sqrt(var + 1e-5)
              * np.asarray(pd["layernorm_weight"])[None, None]
              + np.asarray(pd["layernorm_bias"])[None, None])
    merged = merged * np_silu(z)
    return merged @ np.asarray(pd["out_proj"]["kernel"])


def test_mixer_parity_pooled():
    rows, cols, d_model = 4, 5, 32
    mixer = MambaMixer(d_model=d_model, d_state=8, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, rows * cols, d_model))
    params = mixer.init(jax.random.PRNGKey(1), x, (rows, cols))
    got = mixer.apply(params, x, (rows, cols))
    want = np_mixer(params, np.asarray(x, np.float64), rows, cols,
                    d_state=8, dt_rank=mixer.dt_rank_)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_mixer_parity_full():
    rows, cols, d_model = 3, 4, 32
    mixer = MambaMixer(d_model=d_model, d_state=8, collapse_method="none")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, rows * cols, d_model))
    params = mixer.init(jax.random.PRNGKey(3), x, (rows, cols))
    got = mixer.apply(params, x, (rows, cols))
    want = np_mixer(params, np.asarray(x, np.float64), rows, cols,
                    d_state=8, dt_rank=mixer.dt_rank_, pooled=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_mixer_parity_scaling_factor():
    """scaling_factor multiplies the pooled input (MAE-finetune 0.25,
    mamba_simple_faster.py:295-297)."""
    rows, cols, d_model = 4, 4, 32
    mixer = MambaMixer(d_model=d_model, d_state=8, collapse_method="mean",
                       scaling_factor=0.25)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, rows * cols, d_model))
    params = mixer.init(jax.random.PRNGKey(5), x, (rows, cols))
    got = mixer.apply(params, x, (rows, cols))
    want = np_mixer(params, np.asarray(x, np.float64), rows, cols,
                    d_state=8, dt_rank=mixer.dt_rank_, scaling=0.25)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
