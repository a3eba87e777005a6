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



# ---------------------------------------------------------------------
# COCO-style AP (the mmdet CocoMetric bbox/segm counterparts). One
# shared matching/AP core; bbox and segm differ only in how per-class
# candidate rows and their IoU vectors are built.
# ---------------------------------------------------------------------

def _ap_from_rows(rows, gt_counts, iou_thr: float) -> float:
    """COCO 101-point-interpolated AP for one class (the pycocotools
    COCOeval.accumulate convention, which mmdet's CocoMetric reports:
    precision envelope sampled at recThrs = 0:.01:1 via searchsorted —
    NOT the VOC all-point integral; verified against an independent
    COCOeval-structured oracle in tests/test_metrics_oracle.py).

    rows: score-DESC-sorted list of (img_idx, ious ndarray over that
    image's class gts). gt_counts: {img_idx: n_gt}. Matching: greedy
    best UNMATCHED gt with IoU >= thr (COCO semantics)."""
    import numpy as np

    matched = {i: np.zeros(n, bool) for i, n in gt_counts.items()}
    n_gt = sum(gt_counts.values())
    tp = np.zeros(len(rows))
    fp = np.zeros(len(rows))
    for k, (i, ious) in enumerate(rows):
        m = matched.get(i)
        cand = (np.where((ious >= iou_thr) & ~m)[0]
                if m is not None and ious.size else np.empty(0, int))
        if cand.size:
            j = int(cand[np.argmax(ious[cand])])
            tp[k] = 1
            matched[i][j] = True
        else:
            fp[k] = 1
    if not len(rows):
        return 0.0
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / (ctp + cfp + np.spacing(1))
    # backwards-max envelope, then sample at the 101 recall thresholds
    # (COCOeval.accumulate lines "for i in range(nd-1, 0, -1)" and
    # "inds = np.searchsorted(rc, p.recThrs, side='left')")
    for k in range(len(precision) - 1, 0, -1):
        if precision[k] > precision[k - 1]:
            precision[k - 1] = precision[k]
    rec_thrs = np.linspace(0.0, 1.0, 101)
    inds = np.searchsorted(recall, rec_thrs, side="left")
    q = np.zeros(101)
    valid = inds < len(precision)
    q[valid] = precision[inds[valid]]
    return float(q.mean())


def _np(x):
    import numpy as np

    return np.asarray(x)


def _valid_mask(d, key="boxes"):
    import numpy as np

    return _np(d.get("valid", np.ones(len(_np(d[key])), bool)))


def _box_class_rows(predictions, ground_truths, c):
    """(rows, gt_counts) for class c with box IoU, or None if no gt.
    IoU vectors are computed ONCE per prediction (reused across
    thresholds by coco_map)."""
    import numpy as np

    gt_boxes, gt_counts = [], {}
    for i, g in enumerate(ground_truths):
        m = (_np(g["labels"]) == c) & _valid_mask(g)
        gt_boxes.append(_np(g["boxes"])[m])
        if m.sum():
            gt_counts[i] = int(m.sum())
    if not gt_counts:
        return None
    rows = []
    for i, p in enumerate(predictions):
        m = (_np(p["labels"]) == c) & _valid_mask(p)
        boxes, scores = _np(p["boxes"])[m], _np(p["scores"])[m]
        g = gt_boxes[i]
        ious_all = (np.asarray(box_iou(jnp.asarray(boxes),
                                       jnp.asarray(g)))
                    if len(boxes) and len(g)
                    else np.zeros((len(boxes), len(g))))
        for k, s in enumerate(scores):
            rows.append((float(s), i, ious_all[k]))
    rows.sort(key=lambda r: -r[0])
    return [(i, iou) for _, i, iou in rows], gt_counts


def _mask_class_rows(predictions, ground_truths, c):
    """As _box_class_rows but with pasted-mask IoU vectors."""
    import numpy as np

    gt_masks, gt_counts = [], {}
    for i, g in enumerate(ground_truths):
        m = (_np(g["labels"]) == c) & _valid_mask(g)
        gt_masks.append(_np(g["masks"])[m].astype(bool))
        if m.sum():
            gt_counts[i] = int(m.sum())
    if not gt_counts:
        return None

    def mask_iou(a, b):
        union = np.logical_or(a, b).sum()
        return np.logical_and(a, b).sum() / max(union, 1)

    rows = []
    for i, p in enumerate(predictions):
        m = (_np(p["labels"]) == c) & _valid_mask(p)
        H, W = _np(ground_truths[i]["masks"]).shape[-2:]
        for b, s, pm in zip(_np(p["boxes"])[m], _np(p["scores"])[m],
                            _np(p["masks"])[m]):
            pmask = paste_mask(pm, b, H, W)
            ious = np.array([mask_iou(pmask, gm) for gm in gt_masks[i]])
            rows.append((float(s), i, ious))
    rows.sort(key=lambda r: -r[0])
    return [(i, iou) for _, i, iou in rows], gt_counts


def box_average_precision(predictions, ground_truths,
                          iou_thr: float = 0.5,
                          num_classes: int = 80) -> float:
    """COCO-style (single-IoU) mean box AP over classes, host-side numpy.

    predictions: list per image of dicts with "boxes" (N,4), "scores"
    (N,), "labels" (N,), optional "valid" (N,) — the padded output of
    CascadeMaskRCNN's predict path. ground_truths: list per image of
    dicts with "boxes" (G,4), "labels" (G,), optional "valid"."""
    aps = []
    for c in range(num_classes):
        rg = _box_class_rows(predictions, ground_truths, c)
        if rg is not None:
            aps.append(_ap_from_rows(*rg, iou_thr))
    import numpy as np

    return float(np.mean(aps)) if aps else 0.0


def mask_average_precision(predictions, ground_truths,
                           iou_thr: float = 0.5,
                           num_classes: int = 80) -> float:
    """Instance-segmentation AP (mmdet CocoMetric segm counterpart,
    single IoU threshold): predicted (m, m) RoI masks are pasted into
    full canvases at their boxes and matched to GT masks by mask IoU.

    predictions per image: {"boxes", "scores", "labels", "masks"
    (N, m, m probabilities), optional "valid"}; ground_truths:
    {"boxes", "labels", "masks" (G, H, W) {0,1}, optional "valid"}."""
    aps = []
    for c in range(num_classes):
        rg = _mask_class_rows(predictions, ground_truths, c)
        if rg is not None:
            aps.append(_ap_from_rows(*rg, iou_thr))
    import numpy as np

    return float(np.mean(aps)) if aps else 0.0


def paste_mask(mask28, box, H: int, W: int, thr: float = 0.5):
    """Paste a (m, m) RoI mask probability map into a full (H, W) binary
    canvas at ``box`` (mmdet FCNMaskHead paste semantics, bilinear).
    Boxes fully (or partly) outside the canvas are clipped; fully
    off-canvas boxes yield an empty mask."""
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
    oy2, ox2 = max(oy, 0), max(ox, 0)
    ey, ex = min(oy + h, H), min(ox + w, W)
    if ey > oy2 and ex > ox2:
        canvas[oy2:ey, ox2:ex] = \
            patch[oy2 - oy:ey - oy, ox2 - ox:ex - ox] >= thr
    return canvas


def coco_map(predictions, ground_truths, num_classes: int = 80) -> dict:
    """COCO mAP@[.5:.95] plus AP50/AP75 (the mmdet CocoMetric bbox
    headline numbers). Per-class IoU vectors are computed ONCE and
    re-matched per threshold."""
    import numpy as np

    thrs = np.arange(0.5, 1.0, 0.05)
    per_thr = [[] for _ in thrs]
    for c in range(num_classes):
        rg = _box_class_rows(predictions, ground_truths, c)
        if rg is None:
            continue
        rows, gt_counts = rg
        for t, thr in enumerate(thrs):
            per_thr[t].append(_ap_from_rows(rows, gt_counts, float(thr)))
    if not per_thr[0]:
        return {"mAP": 0.0, "AP50": 0.0, "AP75": 0.0}
    aps = [float(np.mean(a)) for a in per_thr]
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
