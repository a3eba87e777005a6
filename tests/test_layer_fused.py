"""Parity tests for the two-pass fused layer kernel (layer_fused.py).

Locks the Pallas megakernel (interpret mode on CPU) against the
pure-JAX reference `_reference_core`, which is itself the mixer's XLA
path (checked at mixer level below) — so kernel == XLA path
transitively. Covers both orientations (even flat-raster conv / odd
transposed-raster conv with cross-column wrap) and the rematerializing
custom VJP.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.ops.pallas.layer_fused import (
    _reference_core,
    fusable,
    fused_mixer_core,
)

DM, DI, R, N = 64, 128, 4, 16


def _params(key, dm=DM, di=DI, r=R, n=N, bias=False):
    ks = jax.random.split(key, 16)
    u = lambda k, shape, s=0.2: jax.random.uniform(k, shape, jnp.float32,
                                                   -s, s)
    p = dict(
        win=u(ks[0], (dm, 2 * di)),
        bin_=u(ks[15], (2 * di,)) if bias else None,
        wcf=u(ks[1], (4, di)), bcf=u(ks[2], (di,)),
        wab=u(ks[3], (4, di)), bab=u(ks[4], (di,)),
        xpf=u(ks[5], (di, r + 2 * n)), dtwf=u(ks[6], (r, di)),
        dtbf=u(ks[7], (di,), 0.5), Af=u(ks[8], (di, n), 1.0),
        Df=u(ks[9], (di,)),
        xpb=u(ks[10], (di, r + 2 * n)), dtwb=u(ks[11], (r, di)),
        dtbb=u(ks[12], (di,), 0.5), Ab=u(ks[13], (di, n), 1.0),
        Db=u(ks[14], (di,)),
        lnw=jnp.ones((di,)) + u(ks[0], (di,), 0.1),
        lnb=u(ks[1], (di,), 0.1),
        wout=u(ks[2], (di, dm)), bout=u(ks[3], (dm,)) if bias else None,
    )
    return tuple(p.values())


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("grid", [(16, 16), (8, 24)])
def test_fused_matches_reference(transposed, grid):
    H, W = grid
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, H * W, DM), jnp.float32)
    p = _params(jax.random.PRNGKey(1))
    pool_axes = (0,) if transposed else (1,)
    assert fusable(grid, pool_axes, transposed, DI, 4, "mean")
    args = (grid, transposed, 1.0, 1e-5, True, jnp.float32, "ref")
    ref = _reference_core(x, p, *args)
    got = fused_mixer_core(x, p, *args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_recompute_mode(transposed):
    """FASTVIM_LF_RECOMPUTE=1 (pass B re-runs GEMM+conv; pass A writes
    pools only) matches the reference too. Measured slower on TPU —
    kept opt-in."""
    grid = (16, 16)
    H, W = grid
    x = jax.random.normal(jax.random.PRNGKey(8), (2, H * W, DM),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(9))
    args = (grid, transposed, 1.0, 1e-5, True, jnp.float32, "ref")
    ref = _reference_core(x, p, *args)
    os.environ["FASTVIM_LF_RECOMPUTE"] = "1"
    try:
        got = fused_mixer_core(x, p, *args, True)
    finally:
        del os.environ["FASTVIM_LF_RECOMPUTE"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bias_scaling_noln():
    grid = (8, 16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 128, DM),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(3), bias=True)
    args = (grid, False, 0.25, 1e-5, False, jnp.float32, "ref")
    ref = _reference_core(x, p, *args)
    got = fused_mixer_core(x, p, *args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _grad_case(grid, transposed, bias, use_ln, scaling, tile=None,
               bwd="fused", seed=4):
    """Fused-core grads vs jax.vjp of the pure-JAX reference."""
    H, W = grid
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, H * W, DM),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(seed + 1), bias=bias)
    args = (grid, transposed, scaling, 1e-5, use_ln, jnp.float32, "ref")

    env = {"FASTVIM_LF_BWD": bwd}
    if tile:
        env["FASTVIM_LF_TILE"] = str(tile)
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        gf = jax.grad(lambda xx, pp: jnp.sum(
            fused_mixer_core(xx, pp, *args, True) ** 2), argnums=(0, 1))
        gx_f, gp_f = gf(x, p)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    gr = jax.grad(lambda xx, pp: jnp.sum(
        _reference_core(xx, pp, *args) ** 2), argnums=(0, 1))
    gx_r, gp_r = gr(x, p)
    # fp32 accumulation-order noise between the tile-sequential kernel
    # reductions and XLA autodiff's reductions reaches ~2e-3 relative
    # on a handful of near-zero elements; structural errors are O(1)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-3, atol=3e-4)
    assert jax.tree.structure(gp_f) == jax.tree.structure(gp_r)
    for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


def test_fused_grad_remat_mode():
    _grad_case((8, 8), False, False, True, 1.0, bwd="remat")


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_bwd_kernels_single_tile(transposed):
    _grad_case((16, 16), transposed, False, True, 1.0)


@pytest.mark.parametrize("transposed", [False, True])
def test_fused_bwd_kernels_multi_tile(transposed):
    """tile=8 forces 2+ tiles along the tiled axis — exercises the
    cross-tile halo terms of the conv adjoint."""
    _grad_case((16, 24) if not transposed else (24, 16), transposed,
               False, True, 1.0, tile=8)


def test_fused_bwd_bias_scaling_noln():
    _grad_case((16, 16), False, True, False, 0.25, tile=8)


def test_fused_bwd_odd_bias():
    _grad_case((16, 16), True, True, True, 0.5, tile=8)


def test_mixer_layer_fused_env_flag():
    """Mixer-level: FASTVIM_LAYER_FUSED=1 output matches the default
    XLA path (both orientations through Block)."""
    from fastvim_tpu.models.blocks import Block

    H = W = 16
    dm = DM
    x = jax.random.normal(jax.random.PRNGKey(6), (2, H * W, dm),
                          jnp.float32)
    mixer_kwargs = dict(d_state=N, expand=2, collapse_method="mean")

    def run(layer_idx):
        blk = Block(dim=dm, layer_idx=layer_idx, token_size=(H, W),
                    mixer_kwargs=mixer_kwargs, rms_norm=False)
        params = blk.init(jax.random.PRNGKey(7), x, None)
        out, res = blk.apply(params, x, None)
        return np.asarray(out), np.asarray(res), params

    for layer_idx in (0, 1):  # even (flat conv) and odd (transposed)
        base_out, base_res, params = run(layer_idx)
        os.environ["FASTVIM_LAYER_FUSED"] = "1"
        try:
            fused_out, fused_res, params2 = run(layer_idx)
            # identical param trees (checkpoint compatibility)
            assert jax.tree.structure(params) == jax.tree.structure(
                params2)
            for a, b in zip(jax.tree.leaves(params),
                            jax.tree.leaves(params2)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        finally:
            del os.environ["FASTVIM_LAYER_FUSED"]
        np.testing.assert_allclose(fused_out, base_out, rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(fused_res, base_res, rtol=2e-4,
                                   atol=2e-4)


def test_mixer_layer_fused_config_field(monkeypatch):
    """Env-free production dispatch (VERDICT r3 weak #1): the
    `layer_fused` CONFIG field alone routes `model.apply` through the
    megakernel — no FASTVIM_LAYER_FUSED in the environment — and the
    output matches the XLA path. Also: the env var, when set, overrides
    the field (experiment-time escape hatch)."""
    from fastvim_tpu.models import mixer as mixer_mod
    from fastvim_tpu.models.blocks import Block

    monkeypatch.delenv("FASTVIM_LAYER_FUSED", raising=False)

    calls = []
    orig = mixer_mod.MambaMixer._layer_fused_forward

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(mixer_mod.MambaMixer, "_layer_fused_forward", spy)

    H = W = 16
    x = jax.random.normal(jax.random.PRNGKey(13), (2, H * W, DM),
                          jnp.float32)

    def run(layer_fused):
        blk = Block(dim=DM, layer_idx=0, token_size=(H, W),
                    mixer_kwargs=dict(d_state=N, expand=2,
                                      collapse_method="mean",
                                      layer_fused=layer_fused),
                    rms_norm=False)
        params = blk.init(jax.random.PRNGKey(14), x, None)
        out, res = blk.apply(params, x, None)
        return np.asarray(out), np.asarray(res)

    base_out, base_res = run("off")
    assert not calls  # "off" never touches the kernel
    fused_out, fused_res = run("on")
    assert calls  # "on" dispatched env-free (interpret mode on CPU)
    np.testing.assert_allclose(fused_out, base_out, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(fused_res, base_res, rtol=2e-4, atol=2e-4)

    # env var overrides the field: "0" suppresses layer_fused="on"
    calls.clear()
    monkeypatch.setenv("FASTVIM_LAYER_FUSED", "0")
    run("on")
    assert not calls


def test_fused_sharded_matches_unsharded():
    """fused_mixer_core_sharded (data-axis shard_map, params replicated)
    matches the plain call — forward and grads (the VJP's replicated-
    param cotangents must be psummed by shard_map's transpose)."""
    from jax.sharding import Mesh

    from fastvim_tpu.ops.pallas.layer_fused import fused_mixer_core_sharded

    grid = (8, 8)
    H, W = grid
    x = jax.random.normal(jax.random.PRNGKey(11), (2, H * W, DM),
                          jnp.float32)
    p = _params(jax.random.PRNGKey(12))
    args = (grid, False, 1.0, 1e-5, True, jnp.float32, "ref")
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2, 1),
                ("data", "seq"))

    f = lambda xx, pp: fused_mixer_core(xx, pp, *args, True)
    sf = lambda xx, pp: fused_mixer_core_sharded(xx, pp, mesh, *args,
                                                 True)
    ref = f(x, p)
    got = jax.jit(sf)(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    gx_s, gp_s = jax.jit(jax.grad(
        lambda xx, pp: jnp.sum(sf(xx, pp) ** 2), argnums=(0, 1)))(x, p)
    gx_d, gp_d = jax.grad(
        lambda xx, pp: jnp.sum(f(xx, pp) ** 2), argnums=(0, 1))(x, p)
    # same accumulation-order tolerance as the other grad cases: the
    # cross-shard psum reduces in a different order than XLA's single-
    # device reduction
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_d),
                               rtol=3e-3, atol=3e-4)
    for a, b in zip(jax.tree.leaves(gp_s), jax.tree.leaves(gp_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


def test_should_use_fused_dispatch():
    """Gate logic for the multi-device fused dispatch (CPU, 8 virtual
    devices): '1' forces; 'auto' off-TPU is off; the cached data mesh is
    returned only when seq=1 and it divides the batch."""
    from fastvim_tpu.ops.pallas.layer_fused import should_use_fused
    from fastvim_tpu.parallel import mesh as pm

    old = pm._MESH
    try:
        pm._MESH = None
        use, m = should_use_fused("0", 4)
        assert not use
        use, m = should_use_fused("auto", 4)  # CPU backend
        assert not use
        use, m = should_use_fused("1", 4)  # forced, no mesh cached
        assert use and m is None

        pm.make_mesh(data=2, seq=1)
        use, m = should_use_fused("1", 4)
        assert use and m is not None and m.shape["data"] == 2
        use, m = should_use_fused("1", 3)  # batch not divisible
        assert use and m is None

        pm.make_mesh(data=2, seq=2)  # seq-sharded: kernel owns full L
        use, m = should_use_fused("1", 4)
        assert use and m is None
    finally:
        pm._MESH = old
