"""Evaluation metrics beyond top-1: confusion-matrix mIoU (ADE20K) and
COCO-style box IoU helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def confusion_matrix(pred: Array, label: Array, num_classes: int,
                     ignore_index: int = 255) -> Array:
    """(num_classes, num_classes) counts; rows=label, cols=pred."""
    valid = label != ignore_index
    lbl = jnp.where(valid, label, 0)
    idx = lbl.reshape(-1) * num_classes + pred.reshape(-1)
    cm = jnp.bincount(jnp.where(valid.reshape(-1), idx, 0),
                      weights=valid.reshape(-1).astype(jnp.float32),
                      length=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(cm: Array) -> Array:
    """Mean IoU over classes present in the labels."""
    inter = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    present = cm.sum(1) > 0
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    return jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1)


def box_iou(a: Array, b: Array) -> Array:
    """IoU matrix between (N,4) and (M,4) xyxy boxes."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)
