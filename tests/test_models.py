"""Model-level tests: shapes, determinism, pooled-vs-full equivalences,
rotation, feature-extractor mode, pos-embed resize, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.models import VisionMamba, create_model, list_models
from fastvim_tpu.models.blocks import rotate_grid


def tiny_model(**kw):
    cfg = dict(img_size=32, patch_size=8, depth=4, embed_dim=64,
               num_classes=10, drop_path_rate=0.1, rms_norm=True,
               residual_in_fp32=True, final_pool_type="mean",
               ssm_cfg=dict(d_state=8))
    cfg.update(kw)
    return VisionMamba(**cfg)


def test_forward_shapes_and_determinism():
    model = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y1 = model.apply(params, x)
    y2 = model.apply(params, x)
    assert y1.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.all(np.isfinite(np.asarray(y1)))


def test_rotate_grid_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 5))
    r = rotate_grid(x, (3, 4))
    back = rotate_grid(r, (4, 3))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # 3D grid, swap middle/last axes
    x3 = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 5))
    r3 = rotate_grid(x3, (2, 3, 4), axes=(1, 2))
    back3 = rotate_grid(r3, (2, 4, 3), axes=(1, 2))
    np.testing.assert_array_equal(np.asarray(back3), np.asarray(x3))


def test_pooled_vs_full_scan_cols1():
    """With a 1-col grid, pooled scan == full scan (compression factor 1)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8, 3))
    kw = dict(img_size=16, patch_size=8, depth=2, embed_dim=32,
              num_classes=0, drop_path_rate=0.0, if_abs_pos_embed=False,
              rotate_every_block=False, ssm_cfg=dict(d_state=4))
    mp = VisionMamba(collapse_method="mean", **kw)
    mf = VisionMamba(collapse_method="none", **kw)
    # img 16x8, patch 8 → grid (2, 1): cols=1 so pooling is identity
    params = mp.init(jax.random.PRNGKey(1), x)
    yp = mp.apply(params, x, return_features=True)
    yf = mf.apply(params, x, return_features=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), rtol=1e-4,
                               atol=1e-5)


def test_feature_extractor_mode():
    model = tiny_model(out_indices=(1, 3), num_classes=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    feats = model.apply(params, x)
    assert len(feats) == 2
    for f in feats:
        assert f.shape == (2, 4, 4, 64)


def test_pos_embed_resize_high_res():
    model = tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    x_big = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    y = model.apply(params, x_big)
    assert y.shape == (1, 10)
    assert np.all(np.isfinite(np.asarray(y)))


def test_colwise_scanpath():
    model = tiny_model(scanpath_type="colwise")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == (1, 10)


def test_grads_flow():
    model = tiny_model(drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # every parameter should receive gradient somewhere
    nonzero = [float(jnp.abs(l).max()) > 0 for l in leaves]
    assert sum(nonzero) > len(nonzero) * 0.9


def test_registry():
    names = list_models()
    assert "fastvim_tiny" in names
    assert ("vim_tiny_patch16_224_final_pool_mean_"
            "abs_pos_embed_with_noclstok_div2") in names
    m = create_model("fastvim_tiny")
    assert m.embed_dim == 192 and m.depth == 24


def test_dropout_path_training_mode():
    model = tiny_model(drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y1 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_mixer_incremental_decode_matches_forward_branch():
    """MambaMixer.step (cache path): iterating single-token decode over a
    sequence reproduces the causal forward branch computed in one shot
    (conv → scan → D·x → LN → silu(z) gate → out_proj). The vision analogue
    of Mamba.step/allocate_inference_cache (mamba_simple.py:409-471,
    plumbed at models/fastvim.py:468-474)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvim_tpu.models.mixer import MambaMixer
    from fastvim_tpu.ops import causal_conv1d, layer_norm, selective_scan

    B, L, d_model = 2, 10, 16
    mixer = MambaMixer(d_model=d_model, d_state=4, collapse_method="none",
                       n_layer=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, d_model))
    variables = mixer.init(jax.random.PRNGKey(1), x, (L, 1))
    p = variables["params"]

    # one-shot forward branch with the module's own (oracled) ops
    xz = x @ p["in_proj"]["kernel"]
    d_inner = mixer.d_inner
    xin, z = xz[..., :d_inner], xz[..., d_inner:]
    xc = causal_conv1d(xin, p["conv1d_weight"], p["conv1d_bias"])
    dbl = xc @ p["x_proj_weight"]
    r, n = mixer.dt_rank_, mixer.d_state
    dt, Bm, Cm = dbl[..., :r], dbl[..., r:r + n], dbl[..., r + n:]
    dt = dt @ p["dt_proj_weight"]
    A = -jnp.exp(p["A_log"])
    y = selective_scan(xc, dt, A, Bm, Cm, D=None,
                       delta_bias=p["dt_proj_bias"], delta_softplus=True,
                       impl="ref")
    y = y + p["D"][None, None] * xc
    y = layer_norm(y, p["layernorm_weight"], p["layernorm_bias"])
    y = y * jax.nn.silu(z)
    expected = y @ p["out_proj"]["kernel"]

    cache = mixer.init_cache(B)
    outs = []
    for t in range(L):
        o, cache = mixer.apply(variables, x[:, t:t + 1], cache=cache)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5, rtol=1e-4)
