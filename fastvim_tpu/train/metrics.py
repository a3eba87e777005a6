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


def box_average_precision(predictions, ground_truths,
                          iou_thr: float = 0.5,
                          num_classes: int = 80) -> float:
    """COCO-style (single-IoU) mean AP over classes, host-side numpy.

    predictions: list per image of dicts with "boxes" (N,4), "scores"
    (N,), "labels" (N,), optional "valid" (N,) — the padded output of
    CascadeMaskRCNN's predict path. ground_truths: list per image of
    dicts with "boxes" (G,4), "labels" (G,), optional "valid".
    All-point-interpolated AP per class, averaged over classes that have
    ground truth (the mmdet CocoMetric bbox mAP at one threshold)."""
    import numpy as np

    def _np(x):
        return np.asarray(x)

    aps = []
    for c in range(num_classes):
        # gather per-image gt of class c
        gts = []
        n_gt = 0
        for g in ground_truths:
            valid = _np(g.get("valid", np.ones(len(_np(g["boxes"])),
                                               bool)))
            m = (_np(g["labels"]) == c) & valid
            gts.append(_np(g["boxes"])[m])
            n_gt += int(m.sum())
        if n_gt == 0:
            continue
        # gather predictions of class c across images
        rows = []  # (score, img_idx, box)
        for i, p in enumerate(predictions):
            valid = _np(p.get("valid", np.ones(len(_np(p["boxes"])),
                                               bool)))
            m = (_np(p["labels"]) == c) & valid
            for b, s in zip(_np(p["boxes"])[m], _np(p["scores"])[m]):
                rows.append((float(s), i, b))
        rows.sort(key=lambda r: -r[0])
        matched = [np.zeros(len(g), bool) for g in gts]
        tp = np.zeros(len(rows))
        fp = np.zeros(len(rows))
        for k, (_, i, box) in enumerate(rows):
            g = gts[i]
            if len(g) == 0:
                fp[k] = 1
                continue
            ious = np.asarray(box_iou(jnp.asarray(box[None]),
                                      jnp.asarray(g)))[0]
            # best UNMATCHED gt above threshold (COCO matching: a
            # prediction whose argmax gt is taken may still match
            # another overlapping gt)
            cand = np.where((ious >= iou_thr) & ~matched[i])[0]
            if cand.size:
                j = int(cand[np.argmax(ious[cand])])
                tp[k] = 1
                matched[i][j] = True
            else:
                fp[k] = 1
        ctp = np.cumsum(tp)
        cfp = np.cumsum(fp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        # all-point interpolation
        mprec = np.concatenate([[0.0], precision, [0.0]])
        mrec = np.concatenate([[0.0], recall, [1.0]])
        for k in range(len(mprec) - 2, -1, -1):
            mprec[k] = max(mprec[k], mprec[k + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        aps.append(float(np.sum((mrec[idx + 1] - mrec[idx])
                                * mprec[idx + 1])))
    return float(np.mean(aps)) if aps else 0.0


def paste_mask(mask28, box, H: int, W: int, thr: float = 0.5):
    """Paste a (m, m) RoI mask probability map into a full (H, W) binary
    canvas at ``box`` (mmdet FCNMaskHead paste semantics, bilinear)."""
    import numpy as np

    x1, y1, x2, y2 = [float(v) for v in box]
    w = max(int(round(x2 - x1)), 1)
    h = max(int(round(y2 - y1)), 1)
    m = np.asarray(mask28, np.float32)
    ys = (np.arange(h) + 0.5) / h * m.shape[0] - 0.5
    xs = (np.arange(w) + 0.5) / w * m.shape[1] - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, m.shape[0] - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, m.shape[1] - 1)
    y1i = np.clip(y0 + 1, 0, m.shape[0] - 1)
    x1i = np.clip(x0 + 1, 0, m.shape[1] - 1)
    wy = np.clip(ys, 0, m.shape[0] - 1) - y0
    wx = np.clip(xs, 0, m.shape[1] - 1) - x0
    patch = (m[np.ix_(y0, x0)] * (1 - wy)[:, None] * (1 - wx)[None]
             + m[np.ix_(y0, x1i)] * (1 - wy)[:, None] * wx[None]
             + m[np.ix_(y1i, x0)] * wy[:, None] * (1 - wx)[None]
             + m[np.ix_(y1i, x1i)] * wy[:, None] * wx[None])
    canvas = np.zeros((H, W), bool)
    ox, oy = int(round(x1)), int(round(y1))
    ph = min(h, H - oy)
    pw = min(w, W - ox)
    if ph > 0 and pw > 0 and oy < H and ox < W:
        oy2, ox2 = max(oy, 0), max(ox, 0)
        canvas[oy2:oy + ph, ox2:ox + pw] = \
            patch[oy2 - oy:ph, ox2 - ox:pw] >= thr
    return canvas


def mask_average_precision(predictions, ground_truths,
                           iou_thr: float = 0.5,
                           num_classes: int = 80) -> float:
    """Instance-segmentation AP (mmdet CocoMetric segm counterpart,
    single IoU threshold): predicted (m, m) RoI masks are pasted into
    full canvases at their boxes and matched to GT masks by mask IoU
    with the same best-unmatched-gt rule as box AP.

    predictions per image: {"boxes", "scores", "labels", "masks"
    (N, m, m probabilities), optional "valid"}; ground_truths:
    {"boxes", "labels", "masks" (G, H, W) {0,1}, optional "valid"}.
    """
    import numpy as np

    def _np(x):
        return np.asarray(x)

    def mask_iou(a, b):
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        return inter / max(union, 1)

    aps = []
    for c in range(num_classes):
        gts, n_gt = [], 0
        for g in ground_truths:
            valid = _np(g.get("valid", np.ones(len(_np(g["boxes"])),
                                               bool)))
            m = (_np(g["labels"]) == c) & valid
            gts.append(_np(g["masks"])[m].astype(bool))
            n_gt += int(m.sum())
        if n_gt == 0:
            continue
        rows = []
        for i, p in enumerate(predictions):
            valid = _np(p.get("valid", np.ones(len(_np(p["boxes"])),
                                               bool)))
            m = (_np(p["labels"]) == c) & valid
            H, W = _np(ground_truths[i]["masks"]).shape[-2:]
            for b, s, pm in zip(_np(p["boxes"])[m], _np(p["scores"])[m],
                                _np(p["masks"])[m]):
                rows.append((float(s), i, paste_mask(pm, b, H, W)))
        rows.sort(key=lambda r: -r[0])
        matched = [np.zeros(len(g), bool) for g in gts]
        tp = np.zeros(len(rows))
        fp = np.zeros(len(rows))
        for k, (_, i, pmask) in enumerate(rows):
            g = gts[i]
            ious = np.array([mask_iou(pmask, gm) for gm in g]) \
                if len(g) else np.zeros(0)
            cand = np.where((ious >= iou_thr) & ~matched[i])[0]
            if cand.size:
                j = int(cand[np.argmax(ious[cand])])
                tp[k] = 1
                matched[i][j] = True
            else:
                fp[k] = 1
        ctp, cfp = np.cumsum(tp), np.cumsum(fp)
        recall = ctp / n_gt
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        mprec = np.concatenate([[0.0], precision, [0.0]])
        mrec = np.concatenate([[0.0], recall, [1.0]])
        for k in range(len(mprec) - 2, -1, -1):
            mprec[k] = max(mprec[k], mprec[k + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        aps.append(float(np.sum((mrec[idx + 1] - mrec[idx])
                                * mprec[idx + 1])))
    return float(np.mean(aps)) if aps else 0.0


def coco_map(predictions, ground_truths, num_classes: int = 80) -> dict:
    """COCO mAP@[.5:.95] plus AP50/AP75 (the mmdet CocoMetric bbox
    headline numbers), built on box_average_precision."""
    import numpy as np

    thrs = np.arange(0.5, 1.0, 0.05)
    aps = [box_average_precision(predictions, ground_truths, float(t),
                                 num_classes) for t in thrs]
    return {"mAP": float(np.mean(aps)), "AP50": aps[0], "AP75": aps[5]}


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
