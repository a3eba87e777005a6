"""SimpleFPN / ChannelLayerNorm tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fastvim_tpu.models.heads import ChannelLayerNorm, SimpleFPN


def test_channel_layer_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    m = ChannelLayerNorm()
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_simple_fpn_pyramid():
    c = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, c))
    fpn = SimpleFPN(backbone_channel=c, out_channels=32, num_outs=5)
    params = fpn.init(jax.random.PRNGKey(1), x)
    outs = fpn.apply(params, x)
    assert len(outs) == 5
    # strides 4, 8, 16, 32, 64 relative to stride-16 input of 16x16
    assert outs[0].shape == (2, 64, 64, 32)
    assert outs[1].shape == (2, 32, 32, 32)
    assert outs[2].shape == (2, 16, 16, 32)
    assert outs[3].shape == (2, 8, 8, 32)
    assert outs[4].shape == (2, 4, 4, 32)


def test_backbone_to_fpn_end_to_end():
    from fastvim_tpu.models import VisionMamba

    model = VisionMamba(img_size=32, patch_size=8, depth=2, embed_dim=64,
                        num_classes=0, out_indices=(1,),
                        ssm_cfg=dict(d_state=4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    feats = model.apply(params, x)
    fpn = SimpleFPN(backbone_channel=64, out_channels=32, num_outs=5)
    fpn_params = fpn.init(jax.random.PRNGKey(2), feats[0])
    outs = fpn.apply(fpn_params, feats[0])
    assert len(outs) == 5
    assert all(np.all(np.isfinite(np.asarray(o))) for o in outs)
