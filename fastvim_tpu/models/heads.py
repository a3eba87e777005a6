"""Dense-prediction adapters: SimpleFPN (ViTDet) + channel LayerNorm.

TPU-native port of `detection/vitdet/simple_fpn.py`: the backbone's single
stride-16 feature map is turned into a 5-level pyramid (strides 4/8/16/32/
64) via transposed-conv upsampling / max-pool downsampling, then 1×1
lateral + 3×3 output convs with channel LayerNorm. NHWC throughout (the
reference's NCHW LN2d becomes a plain last-axis LayerNorm).

The full mmdetection cascade-R-CNN / mmseg UperNet stacks are out of
scope (SURVEY.md §7.2.6); the parity target is the backbone contract —
multi-scale feature maps ready for those heads — plus these neck layers.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ChannelLayerNorm(nn.Module):
    """LN over the channel axis of NHWC maps (LN2d, simple_fpn.py:15-32).

    Stats in fp32; the output is cast back to ``dtype``. Without the
    cast the fp32 weight/bias silently promoted every FPN level to
    fp32, doubling the RoIAlign einsum + head GEMM traffic in bf16
    configs (found via benchmarks/roi_tpu.py vs the det ablation)."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


class SimpleFPN(nn.Module):
    """(B, H, W, C_backbone) → tuple of num_outs NHWC maps, stride 4→64."""

    backbone_channel: int
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        c = self.backbone_channel

        def deconv(x, features, name):
            return nn.ConvTranspose(features, kernel_size=(2, 2),
                                    strides=(2, 2), dtype=self.dtype,
                                    name=name)(x)

        # 4× up: deconv → LN → GELU → deconv  (simple_fpn.py:58-65)
        p4 = deconv(x, c // 2, "fpn1_deconv1")
        p4 = ChannelLayerNorm(name="fpn1_norm", dtype=self.dtype)(p4)
        p4 = jax.nn.gelu(p4)
        p4 = deconv(p4, c // 4, "fpn1_deconv2")
        p8 = deconv(x, c // 2, "fpn2_deconv")
        p16 = x
        p32 = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

        ins = [p4, p8, p16, p32]
        outs = []
        for i, feat in enumerate(ins):
            lat = nn.Conv(self.out_channels, kernel_size=(1, 1),
                          use_bias=False, dtype=self.dtype,
                          name=f"lateral_{i}")(feat)
            lat = ChannelLayerNorm(name=f"lateral_norm_{i}",
                                   dtype=self.dtype)(lat)
            out = nn.Conv(self.out_channels, kernel_size=(3, 3),
                          padding="SAME", use_bias=False, dtype=self.dtype,
                          name=f"fpn_conv_{i}")(lat)
            out = ChannelLayerNorm(name=f"fpn_norm_{i}",
                                   dtype=self.dtype)(out)
            outs.append(out)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], window_shape=(1, 1),
                                    strides=(2, 2)))
        return tuple(outs)
