"""Masked-mixer parity vs a flip-based numpy reproduction of the
reference masked math (mamba_simple_masked_faster.py:167-325), with real
sorted random masking — locks down the flip-free reverse-branch
equivalence used in fastvim_tpu.models.mixer."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models.mae import sorted_random_masking
from fastvim_tpu.models.mixer import MambaMixer
from tests.test_parity import np_causal_conv, np_scan, np_silu


def np_masked_mixer(params, x, ids_keep, rows, cols, d_state, dt_rank):
    """Faithful flip-based reproduction of Mamba_masked.forward."""
    pd = params["params"]
    B = x.shape[0]
    xz = x @ np.asarray(pd["in_proj"]["kernel"])
    d_inner = xz.shape[-1] // 2
    xin, z = xz[..., :d_inner], xz[..., d_inner:]
    row_ids = ids_keep // cols  # (B, Lv)

    def branch(xb, suffix):
        conv_w = np.asarray(pd[f"conv1d{suffix}_weight"])
        conv_b = np.asarray(pd[f"conv1d{suffix}_bias"])
        xc = np_causal_conv(xb, conv_w, conv_b)
        # scatter-pool with constant divisor (positional ids!)
        Lv = xc.shape[1]
        pooled = np.zeros((B, rows, d_inner))
        for b in range(B):
            for l in range(Lv):
                pooled[b, row_ids[b, l]] += xc[b, l]
        pooled /= cols
        dbl = pooled @ np.asarray(pd[f"x_proj{suffix}_weight"])
        dt = dbl[..., :dt_rank] @ np.asarray(pd[f"dt_proj{suffix}_weight"])
        Bm = dbl[..., dt_rank:dt_rank + d_state]
        Cm = dbl[..., dt_rank + d_state:]
        A = -np.exp(np.asarray(pd[f"A{suffix}_log"]))
        y = np_scan(pooled, dt, A, Bm, Cm,
                    np.asarray(pd[f"dt_proj{suffix}_bias"]))
        # gather
        out = np.zeros_like(xc)
        for b in range(B):
            for l in range(Lv):
                out[b, l] = y[b, row_ids[b, l]]
        return out + np.asarray(pd[f"D{suffix}"])[None, None] * xc

    y_f = branch(xin, "")
    y_b = branch(xin[:, ::-1], "_b")[:, ::-1]  # flip-based reference
    merged = (y_f + y_b) / 2
    mu = merged.mean(-1, keepdims=True)
    var = merged.var(-1, keepdims=True)
    merged = ((merged - mu) / np.sqrt(var + 1e-5)
              * np.asarray(pd["layernorm_weight"])[None, None]
              + np.asarray(pd["layernorm_bias"])[None, None])
    merged = merged * np_silu(z)
    return merged @ np.asarray(pd["out_proj"]["kernel"])


def test_masked_mixer_parity_with_real_masking():
    rows, cols, d_model = 4, 5, 32
    L = rows * cols
    len_keep = 8
    ids_keep, _, _ = sorted_random_masking(jax.random.PRNGKey(7), 2, L,
                                           len_keep)
    mixer = MambaMixer(d_model=d_model, d_state=8, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, len_keep, d_model))
    row_onehot = jax.nn.one_hot(ids_keep // cols, rows)
    params = mixer.init(jax.random.PRNGKey(1), x, (rows, cols),
                        row_onehot=row_onehot)
    got = mixer.apply(params, x, (rows, cols), row_onehot=row_onehot)
    want = np_masked_mixer(params, np.asarray(x, np.float64),
                           np.asarray(ids_keep), rows, cols, d_state=8,
                           dt_rank=mixer.dt_rank_)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
