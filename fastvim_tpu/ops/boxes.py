"""Static-shape box operations for the detection harness.

TPU-native counterparts of the mmdetection primitives used by the
reference's ViTDet cascade Mask R-CNN recipe
(detection/configs/_base_/models/cascade-mask-rcnn_r50_fpn.py):
AnchorGenerator, DeltaXYWHBBoxCoder, MaxIoUAssigner, RandomSampler, NMS
and RoIAlign. Everything here is jit-compatible with static shapes: box
sets are fixed-size with validity masks, NMS runs a fixed number of
suppression rounds, and samplers return fixed-size index sets with
weights instead of dynamic filtering.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------
# anchors (mmdet AnchorGenerator: scales=[8], ratios=[0.5,1,2],
# strides=[4,8,16,32,64])
# --------------------------------------------------------------------

def generate_anchors(featmap_sizes: Sequence[Tuple[int, int]],
                     strides: Sequence[int],
                     scales: Sequence[float] = (8,),
                     ratios: Sequence[float] = (0.5, 1.0, 2.0)
                     ) -> np.ndarray:
    """Concatenated (sum_i Hi*Wi*A, 4) xyxy anchors over pyramid levels.

    Centers at stride/2 offsets; base size = stride (mmdet default
    octave_base_scale semantics with scales in units of stride)."""
    all_anchors = []
    for (H, W), stride in zip(featmap_sizes, strides):
        base = []
        for r in ratios:
            for s in scales:
                size = s * stride
                w = size * math.sqrt(1.0 / r)
                h = size * math.sqrt(r)
                base.append([-w / 2, -h / 2, w / 2, h / 2])
        base = np.asarray(base, np.float32)  # (A, 4)
        ys = (np.arange(H, dtype=np.float32) + 0.5) * stride
        xs = (np.arange(W, dtype=np.float32) + 0.5) * stride
        cx, cy = np.meshgrid(xs, ys)  # (H, W)
        centers = np.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
        anchors = (centers + base[None]).reshape(-1, 4)
        all_anchors.append(anchors)
    return np.concatenate(all_anchors, 0)


# --------------------------------------------------------------------
# DeltaXYWH box coder (mmdet DeltaXYWHBBoxCoder)
# --------------------------------------------------------------------

def delta_encode(boxes: Array, gt: Array,
                 means=(0.0, 0.0, 0.0, 0.0),
                 stds=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """(…, 4) xyxy source/target boxes → normalized dx,dy,dw,dh deltas."""
    pw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    ph = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(gw / pw), jnp.log(gh / ph)], -1)
    return (d - jnp.asarray(means)) / jnp.asarray(stds)


def delta_decode(boxes: Array, deltas: Array,
                 means=(0.0, 0.0, 0.0, 0.0),
                 stds=(1.0, 1.0, 1.0, 1.0),
                 max_shape: Tuple[int, int] = None,
                 wh_ratio_clip: float = 16 / 1000) -> Array:
    """Apply (…, 4) deltas to (…, 4) xyxy boxes."""
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    pw = boxes[..., 2] - boxes[..., 0]
    ph = boxes[..., 3] - boxes[..., 1]
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    gx = px + pw * d[..., 0]
    gy = py + ph * d[..., 1]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    out = jnp.stack([gx - gw * 0.5, gy - gh * 0.5,
                     gx + gw * 0.5, gy + gh * 0.5], -1)
    if max_shape is not None:
        H, W = max_shape
        out = jnp.stack([jnp.clip(out[..., 0], 0, W),
                         jnp.clip(out[..., 1], 0, H),
                         jnp.clip(out[..., 2], 0, W),
                         jnp.clip(out[..., 3], 0, H)], -1)
    return out


def box_iou(a: Array, b: Array) -> Array:
    """IoU matrix between (N, 4) and (M, 4) xyxy boxes."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


# --------------------------------------------------------------------
# static NMS
# --------------------------------------------------------------------

def nms_scan(boxes: Array, scores: Array, iou_threshold: float,
             max_out: int) -> Tuple[Array, Array]:
    """Greedy NMS as the literal sequential recurrence: max_out rounds
    of argmax + suppress. The direct transcription of the torchvision/
    mmcv semantics — kept as the parity oracle for `nms`, whose
    fixpoint formulation removes the max_out-deep dependency chain.

    Returns (indices (max_out,), valid (max_out,) bool). Suppressed /
    exhausted slots have valid=False (index clamps to 0 for safe gather).
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(state, _):
        live_scores, = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        keep = best_score > -jnp.inf
        # suppress overlapping + the selected box itself
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best)
        live_scores = jnp.where(suppress & keep, -jnp.inf, live_scores)
        return (live_scores,), (jnp.where(keep, best, 0),
                                keep)

    (_,), (idx, valid) = jax.lax.scan(
        body, (jnp.where(jnp.isfinite(scores), scores, -jnp.inf),),
        None, length=max_out)
    return idx, valid


def nms(boxes: Array, scores: Array, iou_threshold: float,
        max_out: int, max_rounds: int = 65) -> Tuple[Array, Array]:
    """EXACT greedy NMS with static shapes, as a suppression fixpoint.

    Greedy NMS in descending score order keeps box j iff no
    higher-scored KEPT box overlaps it above the threshold — a forward
    recurrence keep_j = f(keep_{<j}) with a unique solution. Iterating
    its vectorized form

        keep ← finite ∧ ¬ any_i (tri_ij ∧ keep_i),   tri = upper-tri IoU>thr

    from keep⁰ = finite converges to that unique fixpoint (box at
    sorted position j is stable after ≤ j+1 rounds; exit on no-change
    is exact because any fixpoint of the recurrence IS the greedy
    solution). Convergence takes suppression-chain-depth iterations —
    a handful in practice — each one (n,n) bool mask+reduce on the
    VPU, instead of `nms_scan`'s max_out sequential argmax rounds
    (512-deep dependency chain at RPN scale). Tie-handling matches the
    scan (stable argsort ≙ first-index argmax).

    Returns (indices (max_out,), valid (max_out,) bool) identical to
    `nms_scan` (parity-locked in tests/test_boxes.py).

    ``max_rounds`` bounds adversarial inputs (a length-n suppression
    chain needs n rounds of (n,n) work; eval is where hostile box
    layouts occur). The cap is safe because the iteration ALTERNATES
    around the fixpoint K*: k⁰ = all-finite ⊇ K*, and each round maps
    supersets to subsets and back (suppressing with more keepers keeps
    fewer, and vice versa) — so stopping after an ODD round count
    yields a mask that is exact on the first `rounds` sorted positions
    (position j is stable after ≤ j+1 rounds) and a conservative
    SUBSET of the greedy keep beyond them: capped NMS never keeps a
    box exact greedy would suppress. The default (65, forced odd
    below) exceeds every realistic chain depth; tests lock both the
    exact regime and the capped-subset guarantee (test_boxes.py).
    """
    n = boxes.shape[0]
    max_rounds |= 1  # odd ⇒ capped exit is a subset of the fixpoint
    finite = jnp.isfinite(scores)
    order = jnp.argsort(-jnp.where(finite, scores, -jnp.inf))
    b = boxes[order]
    tri = jnp.triu(box_iou(b, b) > iou_threshold, k=1)
    fin = finite[order]

    def body(st):
        k, _, it = st
        k_new = fin & ~(tri & k[:, None]).any(axis=0)
        return k_new, jnp.any(k_new != k), it + 1

    k, changed, it = body((fin, jnp.bool_(True), jnp.int32(0)))
    k, _, _ = jax.lax.while_loop(
        lambda st: st[1] & (st[2] < min(n, max_rounds)), body,
        (k, changed, it))

    # pack the first max_out kept (sorted order = selection order)
    rank = jnp.cumsum(k) - 1
    sel = k & (rank < max_out)
    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_idx = out_idx.at[jnp.where(sel, rank, max_out)[:n]].set(
        order.astype(jnp.int32), mode="drop")
    out_valid = jnp.arange(max_out) < sel.sum()
    return out_idx, out_valid


def fast_nms(boxes: Array, scores: Array, iou_threshold: float,
             max_out: int) -> Tuple[Array, Array]:
    """One-shot matrix NMS (YOLACT "Fast NMS"): box i is kept iff no
    HIGHER-SCORED box overlaps it above the threshold — computed with a
    single sort + one (N,N) IoU + a row max instead of ``max_out``
    sequential suppression rounds.

    Slightly more aggressive than exact greedy NMS (a box suppressed by
    an already-suppressed box stays suppressed), which is why the
    reference-exact `nms` remains the eval path; training proposal
    generation tolerates it (round-3 TPU finding: the sequential scan's
    ~max_out-deep dependency chain dominated the cascade train step).
    Same contract as `nms`: (indices (max_out,), valid (max_out,)).
    """
    n = boxes.shape[0]
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou(b, b)
    # upper triangle: iou[i, j] with i < j = "higher-scored i vs j"
    tri = jnp.triu(iou, k=1)
    suppressed = (tri > iou_threshold).any(axis=0)
    keep = (~suppressed) & jnp.isfinite(scores[order])
    # stable-select the first max_out kept (sorted order = score order)
    rank = jnp.cumsum(keep) - 1
    sel = keep & (rank < max_out)
    out_idx = jnp.zeros((max_out,), jnp.int32)
    out_idx = out_idx.at[jnp.where(sel, rank, max_out)[:n]].set(
        order.astype(jnp.int32), mode="drop")
    out_valid = jnp.arange(max_out) < sel.sum()
    return out_idx, out_valid


# --------------------------------------------------------------------
# MaxIoUAssigner (mmdet semantics)
# --------------------------------------------------------------------

def max_iou_assign(boxes: Array, gt_boxes: Array, gt_valid: Array,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = False) -> Array:
    """Returns assigned_gt (N,) int32: -1 = negative, -2 = ignore,
    >= 0 = matched gt index. gt_valid masks padded gt rows."""
    iou = box_iou(boxes, gt_boxes)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = iou.max(axis=1)
    argmax = iou.argmax(axis=1)
    assigned = jnp.full(boxes.shape[0], -2, jnp.int32)
    assigned = jnp.where(max_iou < neg_iou_thr, -1, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr,
                         argmax.astype(jnp.int32), assigned)
    if match_low_quality:
        # each gt claims its best-overlapping box (even below pos_thr),
        # provided that overlap >= min_pos_iou (mmdet MaxIoUAssigner)
        gt_best = iou.max(axis=0)  # (G,)
        claim = (iou == gt_best[None, :]) & (iou >= min_pos_iou) \
            & gt_valid[None, :]
        # highest-index gt wins ties (mmdet iterates gts in order)
        gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
        claimed = jnp.where(claim, gt_ids[None, :], -1).max(axis=1)
        assigned = jnp.where(claimed >= 0, claimed, assigned)
    return assigned


def random_sample(rng: Array, assigned: Array, num: int,
                  pos_fraction: float
                  ) -> Tuple[Array, Array, Array]:
    """Sample ``num`` boxes: up to num*pos_fraction positives, NEGATIVES
    FILL THE REST — when positives are scarce the sample still has
    ``num`` boxes, matching mmdet RandomSampler (neg_pos_ub=-1). Static
    shapes: returns (indices (num,), is_pos (num,) bool, valid (num,)
    bool); valid can fall short only when candidates themselves run out.
    """
    n = assigned.shape[0]
    r_pos, r_neg = jax.random.split(rng)
    num_pos_max = int(num * pos_fraction)
    pos_mask = assigned >= 0
    neg_mask = assigned == -1
    # positives beyond the quota are excluded: rank positives randomly
    # and keep the first num_pos_max
    pos_rand = jnp.where(pos_mask, jax.random.uniform(r_pos, (n,)), -1.0)
    pos_rank = jnp.argsort(jnp.argsort(-pos_rand))  # rank of each elem
    eligible_pos = pos_mask & (pos_rank < num_pos_max)
    # priority: quota positives (2+u) > negatives (1+u) > excluded (-inf)
    u = jax.random.uniform(r_neg, (n,))
    priority = jnp.where(eligible_pos, 2.0 + u,
                         jnp.where(neg_mask, 1.0 + u, -jnp.inf))
    _, idx = jax.lax.top_k(priority, num)
    valid = priority[idx] > 0.0
    is_pos = pos_mask[idx] & valid
    return idx, is_pos, valid


# --------------------------------------------------------------------
# RoIAlign (mmdet RoIAlign, aligned=True, sampling_ratio=0 → adaptive,
# approximated with a fixed 2×2 sample grid per bin)
# --------------------------------------------------------------------

def roi_align(feat: Array, rois: Array, out_size: int,
              spatial_scale: float, sampling: int = 2,
              chunk: int = 16, xfirst: bool = True) -> Array:
    """feat (H, W, C); rois (R, 4) xyxy in image coords →
    (R, out_size, out_size, C) via bilinear sampling, ``sampling``²
    samples per bin averaged."""
    H, W, C = feat.shape
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    # sample centers: out_size*sampling points per axis, aligned=True
    # (half-pixel offset convention). Coordinates and hat weights are
    # computed in fp32 regardless of feat dtype (bf16 steps shift sample
    # positions by up to ~1.7e-3·bh px); only the final interpolation
    # matrices are cast to the feat dtype for the MXU contraction.
    s = out_size * sampling
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = y1[:, None] + steps[None, :] * bh[:, None] - 0.5  # (R, s)
    xs = x1[:, None] + steps[None, :] * bw[:, None] - 0.5

    # MXU formulation (round 3): bilinear sampling as two hat-function
    # interpolation matmuls instead of 4 corner gathers — TPU gathers of
    # ~R·s² 1-pixel slices dominated the cascade train step (2.8 s @512
    # b2); dense einsums ride the MXU. The hat weight
    # max(0, 1-|coord-i|) over clipped coords reproduces the 2-tap
    # bilinear kernel (incl. the edge-clamp semantics) exactly, and the
    # per-bin sampling² average is folded into the Y/X matrices, making
    # the contraction s× cheaper than sampling the full grid.
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    R = rois.shape[0]
    iy = jnp.arange(H, dtype=jnp.float32)
    ix = jnp.arange(W, dtype=jnp.float32)
    Ymat = jnp.maximum(0, 1 - jnp.abs(ys[..., None] - iy))  # (R, s, H)
    Xmat = jnp.maximum(0, 1 - jnp.abs(xs[..., None] - ix))  # (R, s, W)
    # fold the in-bin average: (R, out, H) / (R, out, W). Cast to the
    # feat dtype HERE — fp32 hat matrices would otherwise promote a
    # bf16 feat back to fp32 inside the einsums, doubling the dominant
    # detection-step traffic (code-review find, round 3).
    Ymat = Ymat.reshape(R, out_size, sampling, H).mean(axis=2).astype(
        feat.dtype)
    Xmat = Xmat.reshape(R, out_size, sampling, W).mean(axis=2).astype(
        feat.dtype)

    def chunk_align(args):
        Y, X = args
        if xfirst:
            # Contract W first, then H. Mathematically identical to the
            # Y-first order but maps far better onto the MXU: the final
            # per-roi batched matmul then has the TINY output dim (out=7)
            # on sublanes (pad 8) and the big free dim (out·C = 1792) on
            # lanes — the Y-first order puts out=7 on LANES, padding each
            # 128-wide output tile 18x (benchmarks/roi_tpu.py).
            tmp = jnp.einsum("rjw,hwc->rjhc", X, feat)
            return jnp.einsum("rih,rjhc->rijc", Y, tmp)
        tmp = jnp.einsum("rih,hwc->riwc", Y, feat)
        return jnp.einsum("riwc,rjw->rijc", tmp, X)

    # chunk rois so the (chunk, out, W, C) intermediate stays bounded
    # (~512 rois x 7 x 128 x 256 f32 was ~470 MB per image-level and
    # OOM'd the cascade at batch 8). Non-divisible R is PADDED up, not
    # silently unchunked — eval's max_per_img=100 with chunk=16 would
    # otherwise rematerialize the unbounded intermediate.
    if R <= chunk:
        return chunk_align((Ymat, Xmat))
    pad = (-R) % chunk
    if pad:
        Ymat = jnp.concatenate(
            [Ymat, jnp.zeros((pad,) + Ymat.shape[1:], Ymat.dtype)])
        Xmat = jnp.concatenate(
            [Xmat, jnp.zeros((pad,) + Xmat.shape[1:], Xmat.dtype)])
    n = (R + pad) // chunk
    Yc = Ymat.reshape(n, chunk, out_size, H)
    Xc = Xmat.reshape(n, chunk, out_size, W)
    out = jax.lax.map(chunk_align, (Yc, Xc))
    return out.reshape(n * chunk, out_size, out_size, C)[:R]


def multilevel_roi_align(feats: Sequence[Array], rois: Array,
                         out_size: int, strides: Sequence[int],
                         finest_scale: float = 56.0,
                         chunk: int = 16, xfirst: bool = True) -> Array:
    """FPN-level-routed RoIAlign (mmdet SingleRoIExtractor:
    level = floor(log2(sqrt(area)/56 + 1e-6)) clamped).

    feats: per-level (H_l, W_l, C) maps (one image). Computes RoIAlign on
    every level and selects per-RoI — static shapes at ~len(feats)× the
    minimal FLOPs, negligible next to the heads."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)
    outs = jnp.stack([
        roi_align(f, rois, out_size, 1.0 / s, chunk=chunk, xfirst=xfirst)
        for f, s in zip(feats, strides)])  # (L, R, o, o, C)
    sel = jax.nn.one_hot(lvl, len(feats), dtype=outs.dtype)  # (R, L)
    return jnp.einsum("lrijc,rl->rijc", outs, sel)
