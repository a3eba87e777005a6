"""Extra scan coverage: bf16 inputs, grouped B/C, seq-sharded tokens.

Mirrors the reference grid's itype {fp16,bf16} and groups dimensions
(test_selective_scan.py parametrization) plus a multi-device
sequence-sharding check the reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvim_tpu.ops import selective_scan_assoc, selective_scan_ref


def test_bf16_inputs_fp32_scan():
    """bf16 activations, scan in fp32 — matches fp32 run at bf16 tolerance
    (the reference kernels upcast identically)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    batch, L, d, n = 2, 32, 16, 8
    u = jax.random.normal(ks[0], (batch, L, d))
    delta = 0.3 * jax.random.normal(ks[1], (batch, L, d))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (batch, L, n))
    C = jax.random.normal(ks[4], (batch, L, n))
    D = jax.random.normal(ks[5], (d,))
    y32 = selective_scan_assoc(u, delta, A, B, C, D=D, delta_softplus=True)
    y16 = selective_scan_assoc(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16), A,
        B.astype(jnp.bfloat16), C.astype(jnp.bfloat16), D=D,
        delta_softplus=True)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=0.1, atol=0.1)


def test_grouped_bc():
    """(batch, L, g, n) grouped B/C broadcast over d//g channels."""
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    batch, L, d, n, g = 2, 16, 8, 4, 2
    u = jax.random.normal(ks[0], (batch, L, d))
    delta = 0.3 * jax.random.normal(ks[1], (batch, L, d))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    Bg = jax.random.normal(ks[3], (batch, L, g, n))
    Cg = jax.random.normal(ks[4], (batch, L, g, n))
    y_g = selective_scan_assoc(u, delta, A, Bg, Cg, delta_softplus=True)
    # manual expansion: group j covers channels [j*d/g, (j+1)*d/g)
    B_full = jnp.repeat(Bg, d // g, axis=2)  # (batch, L, d, n)
    ys = []
    for ch in range(d):
        y_ch = selective_scan_ref(
            u[..., ch:ch + 1], delta[..., ch:ch + 1], A[ch:ch + 1],
            Bg[:, :, ch // (d // g)], Cg[:, :, ch // (d // g)],
            delta_softplus=True)
        ys.append(y_ch)
    want = jnp.concatenate(ys, axis=-1)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    assert y_g.shape == (batch, L, d)


def test_seq_sharded_high_res_forward():
    """Token axis sharded over the seq mesh axis matches unsharded."""
    from fastvim_tpu.models import VisionMamba
    from fastvim_tpu.parallel import make_mesh, shard_batch
    from fastvim_tpu.parallel.mesh import _MESH

    assert jax.device_count() >= 8
    model = VisionMamba(img_size=32, patch_size=8, depth=2, embed_dim=64,
                        num_classes=5, drop_path_rate=0.0,
                        ssm_cfg=dict(d_state=4))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)

    import fastvim_tpu.parallel.mesh as meshmod

    old = meshmod._MESH
    try:
        meshmod._MESH = None
        y_ref = jax.jit(lambda p, x: model.apply(p, x))(params, x)
        mesh = make_mesh(data=2, seq=4)
        xs = shard_batch({"image": x}, mesh)["image"]
        y_sh = jax.jit(lambda p, x: model.apply(p, x))(params, xs)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                                   rtol=2e-3, atol=2e-3)
    finally:
        meshmod._MESH = old


def test_assoc_reverse_long_l_warns(monkeypatch):
    """Forcing impl='assoc' with reverse=True at L>=4096 on TPU is the
    measured numeric hazard (CLAUDE.md round-2) — must warn loudly
    (L<=2048 is measured-fine and must stay silent)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from fastvim_tpu.ops.scan import selective_scan

    b, L, d, n = 1, 4096, 8, 4
    u = jnp.ones((b, L, d), jnp.float32)
    dt = jnp.full((b, L, d), 0.1)
    A = -jnp.ones((d, n))
    B = jnp.ones((b, L, n))
    C = jnp.ones((b, L, n))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.warns(UserWarning, match="assoc.*reverse|reverse.*assoc"):
        # tracing is enough to hit the guard; abstract eval only
        jax.eval_shape(
            lambda *a: selective_scan(*a, impl="assoc", reverse=True),
            u, dt, A, B, C)
    # no warning for forward or short reverse
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        jax.eval_shape(
            lambda *a: selective_scan(*a, impl="assoc"), u, dt, A, B, C)
        jax.eval_shape(
            lambda *a: selective_scan(*a, impl="assoc", reverse=True),
            u[:, :512], dt[:, :512], A, B[:, :512], C[:, :512])
