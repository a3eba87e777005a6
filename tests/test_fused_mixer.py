"""Fused-kernel mixer path == XLA mixer path (same params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.models.mixer import MambaMixer


@pytest.mark.parametrize("collapse", ["mean", "max"])
def test_fused_equals_xla(collapse):
    rows, cols, d_model = 8, 16, 32
    L = rows * cols
    x = jax.random.normal(jax.random.PRNGKey(0), (2, L, d_model))
    mix_x = MambaMixer(d_model=d_model, d_state=8, collapse_method=collapse,
                       fused_kernels="never")
    mix_f = MambaMixer(d_model=d_model, d_state=8, collapse_method=collapse,
                       fused_kernels="always")
    p = mix_x.init(jax.random.PRNGKey(1), x, (rows, cols))
    y_x = mix_x.apply(p, x, (rows, cols))
    y_f = mix_f.apply(p, x, (rows, cols))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               rtol=1e-3, atol=1e-4)


def test_fused_scaling_factor():
    rows, cols, d_model = 4, 8, 32
    L = rows * cols
    x = jax.random.normal(jax.random.PRNGKey(2), (1, L, d_model))
    kw = dict(d_model=d_model, d_state=8, scaling_factor=0.25)
    mix_x = MambaMixer(fused_kernels="never", **kw)
    mix_f = MambaMixer(fused_kernels="always", **kw)
    p = mix_x.init(jax.random.PRNGKey(3), x, (rows, cols))
    np.testing.assert_allclose(
        np.asarray(mix_f.apply(p, x, (rows, cols))),
        np.asarray(mix_x.apply(p, x, (rows, cols))), rtol=1e-3, atol=1e-4)


def test_fused_grads_match_xla():
    rows, cols, d_model = 4, 8, 32
    L = rows * cols
    x = jax.random.normal(jax.random.PRNGKey(4), (1, L, d_model))
    mix_x = MambaMixer(d_model=d_model, d_state=8, fused_kernels="never")
    mix_f = MambaMixer(d_model=d_model, d_state=8, fused_kernels="always")
    p = mix_x.init(jax.random.PRNGKey(5), x, (rows, cols))

    def loss(mix, p):
        return jnp.sum(mix.apply(p, x, (rows, cols)) ** 2)

    g_x = jax.grad(lambda p: loss(mix_x, p))(p)
    g_f = jax.grad(lambda p: loss(mix_f, p))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4)


def test_fused_falls_back_on_unfusable_grid():
    """cols not multiple of 8 (224px grids) → XLA path, still correct."""
    rows, cols, d_model = 4, 6, 32
    L = rows * cols
    x = jax.random.normal(jax.random.PRNGKey(6), (1, L, d_model))
    mix = MambaMixer(d_model=d_model, d_state=8, fused_kernels="auto")
    p = mix.init(jax.random.PRNGKey(7), x, (rows, cols))
    y = mix.apply(p, x, (rows, cols))
    assert np.all(np.isfinite(np.asarray(y)))


def test_flagged_variant_paths_match_default(monkeypatch):
    """The env-flag restructures (merge-at-pooled-level, split in_proj —
    measured slower on the round-3 compiler, kept for re-measurement)
    must stay numerically identical to the default path."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fastvim_tpu.models.mixer import MambaMixer

    mixer = MambaMixer(d_model=32, d_state=4, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = mixer.init(jax.random.PRNGKey(1), x, grid_shape=(4, 6))
    y0 = mixer.apply(params, x, grid_shape=(4, 6))
    monkeypatch.setenv("FASTVIM_MERGE_POOLED", "1")
    monkeypatch.setenv("FASTVIM_SPLIT_INPROJ", "1")
    y1 = mixer.apply(params, x, grid_shape=(4, 6))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_paired_scan_variant_matches_default(monkeypatch):
    """FASTVIM_PAIRED_SCAN=1: both direction scans fused into one grouped
    double-width scan — must match the two-scan default numerically."""
    import numpy as np

    import jax

    from fastvim_tpu.models.mixer import MambaMixer

    mixer = MambaMixer(d_model=32, d_state=4, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 32))
    params = mixer.init(jax.random.PRNGKey(3), x, grid_shape=(4, 6))
    y0 = mixer.apply(params, x, grid_shape=(4, 6))
    monkeypatch.setenv("FASTVIM_PAIRED_SCAN", "1")
    y1 = mixer.apply(params, x, grid_shape=(4, 6))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    # transposed (odd-layer) orientation too
    y0t = mixer.apply(params, x, grid_shape=(6, 4), pool_axes=(0,),
                      transposed=True)
    monkeypatch.delenv("FASTVIM_PAIRED_SCAN")
    y1t = mixer.apply(params, x, grid_shape=(6, 4), pool_axes=(0,),
                      transposed=True)
    np.testing.assert_allclose(np.asarray(y0t), np.asarray(y1t),
                               rtol=1e-5, atol=1e-6)


def test_fused_merge_ln_gate_matches_default(monkeypatch):
    """FASTVIM_FUSED_MERGE=1 (Pallas interpret on CPU): the fused
    broadcast+D-skip+merge+LN+gate kernel must match the XLA path, both
    grid orientations, and be differentiable (recompute VJP)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fastvim_tpu.models.mixer import MambaMixer

    mixer = MambaMixer(d_model=64, d_state=4, collapse_method="mean")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 64))
    params = mixer.init(jax.random.PRNGKey(5), x, grid_shape=(16, 8))
    y0 = mixer.apply(params, x, grid_shape=(16, 8))
    y0t = mixer.apply(params, x, grid_shape=(16, 8), pool_axes=(0,),
                      transposed=True)

    def loss(p):
        return jnp.sum(mixer.apply(p, x, grid_shape=(16, 8)) ** 2)

    g0 = jax.grad(loss)(params)

    monkeypatch.setenv("FASTVIM_FUSED_MERGE", "1")
    y1 = mixer.apply(params, x, grid_shape=(16, 8))
    y1t = mixer.apply(params, x, grid_shape=(16, 8), pool_axes=(0,),
                      transposed=True)
    g1 = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y1t), np.asarray(y0t),
                               rtol=2e-5, atol=2e-5)
    def cmp(v0, v1):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=5e-4, atol=1e-5)

    jax.tree.map(cmp, g0, g1)
