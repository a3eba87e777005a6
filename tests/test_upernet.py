"""UperNet head tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models import VisionMamba
from fastvim_tpu.models.upernet import (
    FCNHead,
    UPerHead,
    UperNetSegmentor,
    segmentation_loss,
    slide_inference,
)


def test_uperhead_shapes():
    feats = [jax.random.normal(jax.random.PRNGKey(i), (2, 8, 8, 32))
             for i in range(4)]
    head = UPerHead(num_classes=10, channels=16)
    params = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(params, feats)
    assert out.shape == (2, 8, 8, 10)


def test_segmentor_end_to_end_with_aux():
    backbone = VisionMamba(img_size=32, patch_size=8, depth=4,
                           embed_dim=32, num_classes=0,
                           out_indices=(0, 1, 2, 3),
                           ssm_cfg=dict(d_state=4))
    seg = UperNetSegmentor(backbone=backbone, num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = seg.init(jax.random.PRNGKey(1), x, with_aux=True)
    logits, aux = seg.apply(params, x, with_aux=True)
    assert logits.shape == (1, 32, 32, 7)
    assert aux.shape == (1, 32, 32, 7)
    labels = jnp.zeros((1, 32, 32), jnp.int32).at[0, 0, 0].set(255)
    loss = segmentation_loss(logits, labels, aux)
    assert np.isfinite(float(loss))

    def loss_fn(p):
        lg, ax = seg.apply(p, x, with_aux=True)
        return segmentation_loss(lg, labels, ax)

    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_slide_inference_covers_image():
    def fake_apply(win):
        B, H, W, _ = win.shape
        return jnp.ones((B, H, W, 3))

    x = jnp.zeros((1, 40, 40, 3))
    out = slide_inference(fake_apply, x, crop=32, stride=16, num_classes=3)
    assert out.shape == (1, 40, 40, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_upernet_bn_norm_option():
    """head_norm="bn": decode-head SyncBN semantics — batch stats at
    train (mutable update), running stats at eval (batch-size
    independent). The reference recipe's norm_cfg=SyncBN
    (upernet_vim.py); under sharded-batch SPMD global-batch stats come
    from XLA collectives."""
    import numpy as np

    from fastvim_tpu.models import VisionMamba
    from fastvim_tpu.models.upernet import UperNetSegmentor

    backbone = VisionMamba(img_size=16, patch_size=8, depth=2,
                           embed_dim=32, num_classes=0,
                           out_indices=(0, 1), drop_path_rate=0.0,
                           ssm_cfg={"d_state": 4})
    seg = UperNetSegmentor(backbone=backbone, num_classes=4, aux_index=1,
                           norm="bn")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    variables = seg.init(jax.random.PRNGKey(1), x, with_aux=True)
    assert "batch_stats" in variables
    (logits, aux), upd = seg.apply(
        variables, x, deterministic=False, with_aux=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert logits.shape == (4, 16, 16, 4)
    # stats moved off init
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        variables["batch_stats"], upd["batch_stats"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # eval with running stats: per-sample output batch-size independent
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    full = seg.apply(variables, x, deterministic=True)
    one = seg.apply(variables, x[:1], deterministic=True)
    np.testing.assert_allclose(np.asarray(full[:1]), np.asarray(one),
                               rtol=2e-5, atol=2e-5)
