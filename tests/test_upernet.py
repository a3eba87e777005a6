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
