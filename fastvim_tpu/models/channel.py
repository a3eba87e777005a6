"""FastChannelVim: per-channel tokenization for multi-channel cell imaging.

TPU-native re-design of the reference channel-wise stack
(models/channel_wise_tokenization/models_channel_mamba_faster.py and the
2dcompress variant):

* ``PatchEmbedPerChannel``: one shared patchify filter applied to every
  channel (the reference's Conv3d(1, D, (1,p,p)), :120-125 — here a 2-D
  conv vmapped over channels, one MXU GEMM) plus a learned per-channel
  embedding (:128,159-191).
* scan orders (:196-201): ``Channel-First`` lays tokens out as
  (rows, cols, C) (channel fastest), ``Spatial-First`` as (C, rows, cols).
* pooling: always over the spatial cols axis of the current orientation
  (mamba_simple_channel_faster.py:225-256); the ``2dcompress`` variant
  pools every 3rd layer over the whole spatial grid leaving a C-length
  channel scan (…_2dcompress.py:227-256).
* HCS (hierarchical channel sampling, :167-185): the *caller* samples a
  channel subset per batch (see `fastvim_tpu.train.hcs_sample`) and passes
  the subset image + channel ids; jit re-specializes per channel count
  (bucketed static shapes — the TPU-native answer to the reference's
  dynamic C, SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.models.blocks import Block
from fastvim_tpu.models.vision_mamba import trunc_normal_init
from fastvim_tpu.ops import add_norm

Array = jax.Array


class PatchEmbedPerChannel(nn.Module):
    patch_size: int = 16
    in_chans: int = 8
    embed_dim: int = 768
    scan_order: str = "Channel-First"
    scanpath_type: str = "rowwise"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array,
                 channel_ids: Optional[Array] = None):
        """x: (batch, H, W, C_used) NHWC; channel_ids: (C_used,) int ids
        into the channel-embedding table (defaults to arange).

        Returns (tokens (batch, L, D), grid_shape) where grid_shape is
        (rows, cols, C) for Channel-First or (C, rows, cols) for
        Spatial-First, matching the flattened token order.
        """
        p = self.patch_size
        B, H, W, C = x.shape
        if channel_ids is None:
            channel_ids = jnp.arange(C)
        # shared filter across channels: fold channels into batch
        xc = x.transpose(0, 3, 1, 2).reshape(B * C, H, W, 1)
        feat = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                       kernel_init=nn.initializers.lecun_normal(),
                       dtype=self.dtype, name="proj")(xc)
        gh, gw = H // p, W // p
        feat = feat.reshape(B, C, gh, gw, self.embed_dim)

        chan_table = self.param("channel_embed",
                                nn.initializers.normal(0.02),
                                (self.in_chans, self.embed_dim))
        chan_emb = jnp.take(chan_table, channel_ids, axis=0)  # (C, D)
        feat = feat + chan_emb[None, :, None, None, :].astype(feat.dtype)

        if self.scanpath_type == "colwise":
            feat = feat.transpose(0, 1, 3, 2, 4)
            gh, gw = gw, gh
        rows, cols = gh, gw

        if self.scan_order == "Channel-First":
            # (B, C, rows, cols, D) → (B, rows, cols, C, D)
            feat = feat.transpose(0, 2, 3, 1, 4)
            grid = (rows, cols, C)
        else:  # Spatial-First: (B, C, rows, cols, D)
            grid = (C, rows, cols)
        return feat.reshape(B, C * rows * cols, self.embed_dim), grid


class ChannelVisionMamba(nn.Module):
    """FastChannelVim trunk (models_channel_mamba_faster.py:458-682)."""

    img_size: int = 224
    patch_size: int = 16
    depth: int = 24
    embed_dim: int = 384
    channels: int = 8
    num_classes: int = 161
    ssm_cfg: Any = None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    fused_add_norm: bool = True
    final_pool_type: str = "mean"
    if_abs_pos_embed: bool = True
    init_layer_scale: Optional[float] = None
    scan_order: str = "Channel-First"
    scanpath_type: str = "rowwise"
    use_norm_after_ssm: bool = True
    rotate_every_block: bool = True
    collapse_method: str = "mean"
    compress_2d: bool = False  # the "_2dcompress" variant
    scan_impl: str = "auto"
    # Route pooled scans (L = C·rows ≈ 112) to the Pallas chunked kernel
    # on TPU: 5.3x fwd / measured win (benchmarks/channel_scan_ab_tpu.py)
    # — the channel model's assoc sweeps are fully exposed (its full-L
    # elementwise stream is smaller than one scan temp).
    pallas_min_l: Optional[int] = 64
    remat: bool = False  # rematerialize blocks (fit lever; ps8×C is long)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, channel_ids: Optional[Array] = None,
                 deterministic: bool = True, return_features: bool = False):
        B = x.shape[0]
        C = x.shape[-1]
        tokens, grid = PatchEmbedPerChannel(
            patch_size=self.patch_size, in_chans=self.channels,
            embed_dim=self.embed_dim, scan_order=self.scan_order,
            scanpath_type=self.scanpath_type, dtype=self.dtype,
            name="patch_embed")(x, channel_ids)

        if self.scan_order == "Channel-First":
            rows, cols, _ = grid
            transpose_axes = (0, 1)
        else:
            _, rows, cols = grid
            transpose_axes = (1, 2)

        if self.if_abs_pos_embed:
            pos = self.param("pos_embed", trunc_normal_init(0.02),
                             (1, rows * cols, self.embed_dim))
            # broadcast over channels per scan order
            # (models_channel_mamba_faster.py:620-627)
            pos_g = pos.reshape(1, rows, cols, 1, self.embed_dim)
            if self.scan_order == "Channel-First":
                pos_full = jnp.broadcast_to(
                    pos_g, (1, rows, cols, C, self.embed_dim))
            else:
                pos_full = jnp.broadcast_to(
                    pos_g.reshape(1, 1, rows, cols, self.embed_dim),
                    (1, C, rows, cols, self.embed_dim))
            tokens = tokens + pos_full.reshape(
                1, C * rows * cols, self.embed_dim).astype(tokens.dtype)
            if self.drop_rate > 0:
                tokens = nn.Dropout(self.drop_rate)(
                    tokens, deterministic=deterministic)

        mixer_kwargs = dict(
            use_norm_after_ssm=self.use_norm_after_ssm,
            init_layer_scale=self.init_layer_scale,
            collapse_method=self.collapse_method,
            n_layer=self.depth,
            scan_impl=self.scan_impl,
            pallas_min_l=self.pallas_min_l,
            **(self.ssm_cfg or {}),
        )
        import numpy as np

        dpr = [float(r) for r in
               np.linspace(0, self.drop_path_rate, self.depth)]
        inter_dpr = [0.0] + dpr[:-1] if self.depth > 1 else [0.0]

        hidden, residual = tokens, None
        block_cls = (nn.remat(Block, static_argnums=(3,))
                     if self.remat else Block)
        for i in range(self.depth):
            rotate = None  # default odd-layer schedule
            if self.compress_2d:
                assert self.scan_order == "Channel-First", (
                    "2dcompress implements Channel-First only "
                    "(…_2dcompress.py:224)")
                if (i + 1) % 3 == 0:
                    pool_axes = (0, 1)  # pool whole spatial grid → C scan
                else:
                    pool_axes = (1, 2)  # pool cols·C → rows scan
                # row→col→channel cycle: rotate only the middle layer of
                # each triple (…_2dcompress.py:265-267)
                rotate = (self.rotate_every_block and (i + 2) % 3 == 0)
            else:
                if self.scan_order == "Channel-First":
                    pool_axes = (1,)  # pool cols of (rows, cols, C)
                else:
                    pool_axes = (2,)  # pool cols of (C, rows, cols)
            hidden, residual = block_cls(
                dim=self.embed_dim, layer_idx=i, token_size=grid,
                mixer_kwargs=mixer_kwargs, pool_axes=pool_axes,
                transpose_axes=transpose_axes,
                rotate_every_block=self.rotate_every_block, rotate=rotate,
                rms_norm=self.rms_norm,
                residual_in_fp32=self.residual_in_fp32,
                norm_eps=self.norm_epsilon, drop_path=inter_dpr[i],
                dtype=self.dtype, name=f"layers_{i}",
            )(hidden, residual, deterministic)

        norm_w = self.param("norm_f_weight", nn.initializers.ones,
                            (self.embed_dim,))
        norm_b = (None if self.rms_norm else
                  self.param("norm_f_bias", nn.initializers.zeros,
                             (self.embed_dim,)))
        from fastvim_tpu.models.layers import DropPath

        hidden = DropPath(self.drop_path_rate)(hidden, deterministic)
        hidden = add_norm(hidden, norm_w, norm_b, residual=residual,
                          prenorm=False,
                          residual_in_fp32=self.residual_in_fp32,
                          eps=self.norm_epsilon, rms=self.rms_norm,
                          out_dtype=self.dtype)

        if self.final_pool_type == "mean":
            feat = hidden.mean(axis=1)
        elif self.final_pool_type == "none":
            feat = hidden[:, -1]
        else:
            feat = hidden
        if return_features:
            return feat
        logits = nn.Dense(self.num_classes,
                          kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="head")(feat)
        if self.final_pool_type == "max":
            logits = logits.max(axis=1)
        return logits


def hcs_sample(rng, num_channels: int):
    """Hierarchical channel sampling (host-side): returns a sorted list of
    channel indices of random size 1..num_channels. Mirrors
    PatchEmbedPerChannel HCS (models_channel_mamba_faster.py:167-185);
    run on host per batch — jit specializes per resulting channel count.
    """
    import numpy as np

    rng = np.random.default_rng(rng if isinstance(rng, int) else None)
    c_new = int(rng.integers(1, num_channels + 1))
    channels = sorted(rng.choice(num_channels, size=c_new, replace=False))
    return [int(c) for c in channels]


def _channel_factory(embed_dim, depth, patch_size, collapse="mean",
                     compress_2d=False):
    def factory(img_size=224, **kwargs):
        cfg = dict(img_size=img_size, patch_size=patch_size,
                   embed_dim=embed_dim, depth=depth, rms_norm=True,
                   residual_in_fp32=True, fused_add_norm=True,
                   collapse_method=collapse, compress_2d=compress_2d)
        cfg.update(kwargs)
        return ChannelVisionMamba(**cfg)
    return factory


CHANNEL_MODELS = {
    # reference registry name (models_channel_mamba_faster.py:685-706)
    "channelvim_small_patch16_224_final_pool_mean_abs_pos_embed_"
    "with_noclstok_div2": _channel_factory(384, 24, 16),
    "fastchannelvim_small_ps16": _channel_factory(384, 24, 16),
    "fastchannelvim_small_ps8": _channel_factory(384, 24, 8),
    "fastchannelvim_small_ps16_maxpool": _channel_factory(
        384, 24, 16, collapse="max"),
    "fastchannelvim_small_ps8_maxpool": _channel_factory(
        384, 24, 8, collapse="max"),
    "fastchannelvim_small_ps16_2dcompress": _channel_factory(
        384, 24, 16, compress_2d=True),
    "fastchannelvim_small_ps8_2dcompress": _channel_factory(
        384, 24, 8, compress_2d=True),
    "channelvim_small_ps16_baseline": _channel_factory(
        384, 24, 16, collapse="none"),
    "channelvim_small_ps8_baseline": _channel_factory(
        384, 24, 8, collapse="none"),
}
