"""UperNet semantic-segmentation head (+ FCN aux head), NHWC flax.

TPU-native counterpart of the reference's mmsegmentation recipe
(`segmentation/configs/_base_/models/upernet_vim.py`: UPerHead over the
backbone's 4 multi-scale maps with pool_scales (1,2,3,6), channels=512,
plus an FCNHead aux head on the 3rd map). The backbone contract is
`VisionMamba(out_indices=[...])` → 4 NHWC maps at stride 16 (the
reference resizes pos-embeds instead of using a hierarchical backbone;
maps share the same resolution and UperNet's FPN degenerates gracefully).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _resize(x: Array, hw: Tuple[int, int]) -> Array:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear")


class ConvModule(nn.Module):
    features: int
    kernel: int = 3
    norm: str = "ln"  # "ln" (default) | "bn" (the reference recipe's
    # SyncBN, upernet_vim.py norm_cfg — under sharded-batch SPMD the
    # batch statistics are computed over the GLOBAL batch, i.e. SyncBN
    # semantics come for free from XLA's collectives)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        else:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        return jax.nn.relu(x)


class PSPModule(nn.Module):
    """Pyramid pooling (PSPNet): adaptive-avg-pool to each scale, conv,
    upsample back, concat."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    channels: int = 512
    norm: str = "ln"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        outs = [x]
        for s in self.pool_scales:
            # adaptive average pooling to an s×s grid (clamped to the
            # map size for small inputs)
            ph, pw = max(H // min(s, H), 1), max(W // min(s, W), 1)
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = ConvModule(self.channels, kernel=1, norm=self.norm,
                                dtype=self.dtype)(pooled, train)
            outs.append(_resize(pooled, (H, W)))
        return jnp.concatenate(outs, axis=-1)


class UPerHead(nn.Module):
    num_classes: int = 150
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1
    norm: str = "ln"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], deterministic: bool = True):
        """feats: list of 4 NHWC maps (same or pyramid resolutions).
        Returns per-pixel logits at the first map's resolution."""
        train = not deterministic
        # PSP on the deepest map
        psp = PSPModule(self.pool_scales, self.channels, norm=self.norm,
                        dtype=self.dtype)(feats[-1], train)
        psp = ConvModule(self.channels, norm=self.norm,
                         dtype=self.dtype)(psp, train)

        # lateral convs + top-down fusion
        laterals = [ConvModule(self.channels, kernel=1, norm=self.norm,
                               dtype=self.dtype)(f, train)
                    for f in feats[:-1]] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], hw)
        outs = [ConvModule(self.channels, norm=self.norm,
                           dtype=self.dtype)(l, train)
                for l in laterals[:-1]] + [laterals[-1]]
        hw = outs[0].shape[1:3]
        fused = jnp.concatenate([_resize(o, hw) for o in outs], axis=-1)
        fused = ConvModule(self.channels, norm=self.norm,
                           dtype=self.dtype)(fused, train)
        if self.dropout > 0:
            fused = nn.Dropout(self.dropout)(fused,
                                             deterministic=deterministic)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(fused)


class FCNHead(nn.Module):
    """Auxiliary FCN head (1 conv) on an intermediate map."""

    num_classes: int = 150
    channels: int = 256
    dropout: float = 0.1
    norm: str = "ln"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        x = ConvModule(self.channels, norm=self.norm,
                       dtype=self.dtype)(x, not deterministic)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x)


class UperNetSegmentor(nn.Module):
    """Backbone + UPerHead (+aux) with upsampling to input resolution."""

    backbone: Any
    num_classes: int = 150
    aux_index: int = 2  # which backbone map feeds the aux head
    norm: str = "ln"  # "bn" = the reference's SyncBN recipe
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array, deterministic: bool = True,
                 with_aux: bool = False):
        feats = self.backbone(images, deterministic=deterministic)
        logits = UPerHead(num_classes=self.num_classes, norm=self.norm,
                          dtype=self.dtype,
                          name="decode_head")(feats, deterministic)
        H, W = images.shape[1:3]
        logits = _resize(logits, (H, W))
        if with_aux:
            aux = FCNHead(num_classes=self.num_classes, norm=self.norm,
                          dtype=self.dtype,
                          name="aux_head")(feats[self.aux_index],
                                           deterministic)
            return logits, _resize(aux, (H, W))
        return logits


def segmentation_loss(logits: Array, labels: Array,
                      aux_logits=None, aux_weight: float = 0.4,
                      ignore_index: int = 255) -> Array:
    """Per-pixel CE with ignore label (+0.4-weighted aux loss, matching
    the reference schedule's FCN aux weighting)."""

    def ce(lg):
        valid = labels != ignore_index
        lbl = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    loss = ce(logits)
    if aux_logits is not None:
        loss = loss + aux_weight * ce(aux_logits)
    return loss


def slide_inference(apply_fn, images: Array, crop: int = 512,
                    stride: int = 341, num_classes: int = 150) -> Array:
    """Sliding-window inference (the reference's slide test mode,
    segmentation config :42-76): average overlapping window logits."""
    B, H, W, C = images.shape
    logits_sum = jnp.zeros((B, H, W, num_classes), jnp.float32)
    counts = jnp.zeros((1, H, W, 1), jnp.float32)
    ys = list(range(0, max(H - crop, 0) + 1, stride)) or [0]
    xs = list(range(0, max(W - crop, 0) + 1, stride)) or [0]
    if ys[-1] + crop < H:
        ys.append(H - crop)
    if xs[-1] + crop < W:
        xs.append(W - crop)
    for y in ys:
        for x in xs:
            win = jax.lax.dynamic_slice(
                images, (0, y, x, 0), (B, min(crop, H), min(crop, W), C))
            lg = apply_fn(win).astype(jnp.float32)
            logits_sum = jax.lax.dynamic_update_slice(
                logits_sum,
                jax.lax.dynamic_slice(
                    logits_sum, (0, y, x, 0),
                    (B, lg.shape[1], lg.shape[2], num_classes)) + lg,
                (0, y, x, 0))
            counts = jax.lax.dynamic_update_slice(
                counts,
                jax.lax.dynamic_slice(
                    counts, (0, y, x, 0), (1, lg.shape[1], lg.shape[2], 1)
                ) + 1.0,
                (0, y, x, 0))
    return logits_sum / jnp.maximum(counts, 1.0)
