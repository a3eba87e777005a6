"""Mixup/CutMix augmentation + soft-target cross entropy.

TPU-native port of the timm ``Mixup`` usage in the reference
(`imagenet_classification/supervised_imagenet.py:69-92`): per-batch
mixup/cutmix with label smoothing producing soft targets, and the matching
SoftTargetCrossEntropy / LabelSmoothingCrossEntropy losses. Implemented as
pure jnp batch transforms (run under jit on device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def one_hot_smooth(labels: Array, num_classes: int,
                   smoothing: float = 0.0) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, H: int, W: int, lam: Array):
    """CutMix box with area ratio 1−lam (timm semantics)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    r1, r2 = jax.random.split(rng)
    cy = jax.random.randint(r1, (), 0, H)
    cx = jax.random.randint(r2, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    return y1, y2, x1, x2


def mixup_cutmix(
    rng: Array,
    images: Array,  # (batch, H, W, C)
    labels: Array,  # (batch,) int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[Array, Array]:
    """Batch-level mixup/cutmix. Returns (mixed images, soft targets)."""
    B, H, W, _ = images.shape
    r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)
    perm_images = images[::-1]
    y1 = one_hot_smooth(labels, num_classes, smoothing)
    y2 = y1[::-1]

    # alphas are static floats: beta(0,0) samples NaN, so a disabled
    # mode must never be sampled or selected (timm Mixup only switches
    # between modes whose alpha > 0; with both zero the caller should
    # pass mixup_config=None, but degrade to identity rather than NaN)
    lam_m = (jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
             if mixup_alpha > 0 else jnp.float32(1.0))
    lam_c = (jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
             if cutmix_alpha > 0 else jnp.float32(1.0))
    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cutmix = jax.random.bernoulli(r_switch, switch_prob)
    else:
        use_cutmix = jnp.bool_(cutmix_alpha > 0)

    # mixup branch
    mixed_m = images * lam_m + perm_images * (1 - lam_m)

    # cutmix branch
    by1, by2, bx1, bx2 = _rand_bbox(r_box, H, W, lam_c)
    yy = jnp.arange(H)[None, :, None, None]
    xx = jnp.arange(W)[None, None, :, None]
    in_box = ((yy >= by1) & (yy < by2) & (xx >= bx1) & (xx < bx2))
    mixed_c = jnp.where(in_box, perm_images, images)
    lam_c_adj = 1.0 - ((by2 - by1) * (bx2 - bx1)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_c_adj, lam_m)
    targets = y1 * lam + y2 * (1 - lam)

    apply = jax.random.bernoulli(r_apply, prob)
    images_out = jnp.where(apply, mixed, images)
    targets_out = jnp.where(apply, targets, y1)
    return images_out.astype(images.dtype), targets_out


def soft_target_cross_entropy(logits: Array, targets: Array) -> Array:
    """timm SoftTargetCrossEntropy: mean over batch of −Σ t·log_softmax."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def cross_entropy(logits: Array, labels: Array,
                  smoothing: float = 0.0) -> Array:
    targets = one_hot_smooth(labels, logits.shape[-1], smoothing)
    return soft_target_cross_entropy(logits, targets)


def accuracy(logits: Array, labels: Array, k: int = 1) -> Array:
    if k == 1:
        return jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    topk = jnp.argsort(logits, axis=-1)[:, -k:]
    return jnp.mean(jnp.any(topk == labels[:, None], axis=-1))
