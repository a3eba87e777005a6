"""Unit tests for the static-shape detection primitives (ops/boxes.py)
against independent numpy references — the mmdet semantics the reference
delegates to (cascade-mask-rcnn_r50_fpn.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from fastvim_tpu.ops.boxes import (
    box_iou,
    delta_decode,
    delta_encode,
    generate_anchors,
    max_iou_assign,
    multilevel_roi_align,
    nms,
    random_sample,
    roi_align,
)


def test_anchor_count_and_geometry():
    a = generate_anchors([(4, 4), (2, 2)], [8, 16])
    assert a.shape == (4 * 4 * 3 + 2 * 2 * 3, 4)
    # first cell, ratio 0.5 scale 8, stride 8: 64-px² anchor at (4, 4)
    w = a[0, 2] - a[0, 0]
    h = a[0, 3] - a[0, 1]
    np.testing.assert_allclose(w * h, (8 * 8) ** 2, rtol=1e-5)
    np.testing.assert_allclose(h / w, 0.5, rtol=1e-5)
    np.testing.assert_allclose((a[0, 0] + a[0, 2]) / 2, 4.0, atol=1e-5)


def test_delta_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 50, (16, 2))
    boxes = np.concatenate([src, src + rng.uniform(5, 40, (16, 2))], 1)
    gt = boxes + rng.uniform(-3, 3, boxes.shape)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    stds = (0.1, 0.1, 0.2, 0.2)
    d = delta_encode(jnp.asarray(boxes), jnp.asarray(gt), stds=stds)
    back = delta_decode(jnp.asarray(boxes), d, stds=stds)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-4)


def test_nms_matches_naive():
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 60, (30, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(8, 25, (30, 2))], 1)
    scores = rng.uniform(0, 1, 30).astype(np.float32)

    def naive_nms(b, s, thr):
        order = np.argsort(-s)
        keep = []
        while order.size:
            i = order[0]
            keep.append(i)
            iou = np.asarray(box_iou(jnp.asarray(b[i:i + 1]),
                                     jnp.asarray(b[order[1:]])))[0]
            order = order[1:][iou <= thr]
        return keep

    expected = naive_nms(boxes, scores, 0.5)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 30)
    got = [int(i) for i, v in zip(idx, valid) if v]
    assert got == expected


def test_nms_fixpoint_matches_scan():
    """The fixpoint `nms` must reproduce the sequential `nms_scan`
    exactly — indices AND validity — across random geometries,
    thresholds, caps, -inf scores, and a worst-case deep alternating
    suppression chain (the slowest-converging input)."""
    from fastvim_tpu.ops.boxes import nms_scan

    rng = np.random.default_rng(7)
    for trial, (n, thr, cap) in enumerate(
            [(30, 0.5, 30), (64, 0.3, 16), (128, 0.7, 64),
             (50, 0.5, 100)]):
        xy = rng.uniform(0, 40, (n, 2))
        boxes = np.concatenate([xy, xy + rng.uniform(5, 30, (n, 2))], 1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        if trial % 2:  # sprinkle invalid candidates
            scores[:: 5] = -np.inf
        i1, v1 = nms_scan(jnp.asarray(boxes), jnp.asarray(scores),
                          thr, cap)
        i2, v2 = nms(jnp.asarray(boxes), jnp.asarray(scores), thr, cap)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                      np.asarray(i2)[np.asarray(v2)])

    # deep chain: box k overlaps only box k+1, scores descending, so
    # greedy keeps the evens — fast-NMS-style one-shot would keep only
    # box 0 wrong-free but suppress the re-enabled evens; the fixpoint
    # must iterate ~chain-depth rounds to get this right
    n = 40
    boxes = np.stack([np.arange(n) * 6.0, np.zeros(n),
                      np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)], 1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    i1, v1 = nms_scan(jnp.asarray(boxes), jnp.asarray(scores), 0.2, n)
    i2, v2 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.2, n)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1)[np.asarray(v1)],
                                  np.asarray(i2)[np.asarray(v2)])
    assert list(np.asarray(i2)[np.asarray(v2)]) == list(range(0, n, 2))

    # vmapped + jitted (the eval path's usage shape)
    b = jnp.asarray(np.stack([boxes, boxes[::-1]]))
    s = jnp.asarray(np.stack([scores, scores]))
    f = jax.jit(jax.vmap(lambda bb, ss: nms(bb, ss, 0.2, 16)))
    ib, vb = f(b, s)
    i1, v1 = nms(b[1], s[1], 0.2, 16)
    np.testing.assert_array_equal(np.asarray(ib[1]), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(vb[1]), np.asarray(v1))


def test_max_iou_assign_semantics():
    gt = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40],
                      [0, 0, 1, 1]], jnp.float32)
    gt_valid = jnp.asarray([True, True, False])
    boxes = jnp.asarray([
        [0, 0, 10, 10],      # iou 1.0 with gt0 → pos
        [0, 0, 10, 20],      # iou 0.5 with gt0 → between thresholds
        [100, 100, 110, 110],  # iou 0 → neg
        [0, 0, 1, 1],        # overlaps only the INVALID gt → neg
        [18, 18, 30, 30],    # iou ≈0.22 with gt1 → neg, but gt1's best
    ], jnp.float32)
    a = max_iou_assign(boxes, gt, gt_valid, pos_iou_thr=0.7,
                       neg_iou_thr=0.3)
    assert a[0] == 0 and a[1] == -2 and a[2] == -1 and a[3] == -1
    assert a[4] == -1
    # low-quality matching: gt1's best-overlapping box gets claimed
    a2 = max_iou_assign(boxes, gt, gt_valid, pos_iou_thr=0.7,
                        neg_iou_thr=0.3, min_pos_iou=0.1,
                        match_low_quality=True)
    assert a2[4] == 1 and a2[0] == 0


def test_random_sample_counts():
    assigned = jnp.asarray([0, 1, -1, -1, -1, -1, -2, 0], jnp.int32)
    idx, is_pos, valid = random_sample(jax.random.PRNGKey(0), assigned,
                                       num=6, pos_fraction=0.5)
    assert idx.shape == (6,)
    a = np.asarray(assigned)[np.asarray(idx)]
    # valid positives really are positives; valid negatives negatives
    assert all(a[i] >= 0 for i in range(6)
               if valid[i] and is_pos[i])
    assert all(a[i] == -1 for i in range(6)
               if valid[i] and not is_pos[i])
    # only 3 positives exist and pos quota is 3
    assert int(np.sum(np.asarray(is_pos) & np.asarray(valid))) == 3


def test_roi_align_linear_ramp_exact():
    """Bilinear sampling of a linear ramp is exact: each output bin value
    equals the ramp at the bin's center."""
    H = W = 16
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    feat = (2.0 * xs + 3.0 * ys).astype(np.float32)[..., None]
    rois = jnp.asarray([[2.0, 4.0, 10.0, 12.0]])
    out = np.asarray(roi_align(jnp.asarray(feat), rois, 4, 1.0))
    bw, bh = 8.0 / 4, 8.0 / 4
    for i in range(4):
        for j in range(4):
            cx = 2.0 + (j + 0.5) * bw - 0.5
            cy = 4.0 + (i + 0.5) * bh - 0.5
            np.testing.assert_allclose(out[0, i, j, 0], 2 * cx + 3 * cy,
                                       rtol=1e-5)


def test_multilevel_roi_align_routes_by_scale():
    feats = [jnp.full((32 // s, 32 // s, 1), float(k))
             for k, s in enumerate([4, 8, 16, 32])]
    # small roi (area 32² → lvl floor(log2(32/56)) < 0 → 0);
    # large roi (area 448² → lvl 3)
    rois = jnp.asarray([[0, 0, 32, 32], [0, 0, 448, 448]], jnp.float32)
    out = np.asarray(multilevel_roi_align(feats, rois, 2, [4, 8, 16, 32]))
    assert np.allclose(out[0], 0.0)
    assert np.allclose(out[1], 3.0)


def test_random_sample_tops_up_negatives_when_positives_scarce():
    """mmdet RandomSampler semantics: scarce positives do NOT shrink the
    sample — negatives fill to ``num`` (code-review r2 finding)."""
    assigned = jnp.asarray([0] + [-1] * 999, jnp.int32)
    idx, is_pos, valid = random_sample(jax.random.PRNGKey(1), assigned,
                                       num=256, pos_fraction=0.5)
    assert int(valid.sum()) == 256
    assert int((is_pos & valid).sum()) == 1
    a = np.asarray(assigned)[np.asarray(idx)]
    assert all(a[i] == -1 for i in range(256)
               if valid[i] and not is_pos[i])


def test_fast_nms_matches_exact_on_separated_boxes():
    """Non-overlapping boxes: fast NMS == exact NMS (all kept, score
    order)."""
    from fastvim_tpu.ops.boxes import fast_nms, nms

    boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30],
                         [40, 40, 50, 50], [60, 60, 70, 70]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.95, 0.7])
    i1, v1 = nms(boxes, scores, 0.5, 4)
    i2, v2 = fast_nms(boxes, scores, 0.5, 4)
    assert v1.all() and v2.all()
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fast_nms_suppresses_overlaps():
    from fastvim_tpu.ops.boxes import fast_nms

    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                         [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.95, 0.5])
    idx, valid = fast_nms(boxes, scores, 0.5, 3)
    # box 1 (highest) kept, box 0 suppressed by it, box 2 kept
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {1, 2}
    # -inf scores never selected
    scores2 = jnp.asarray([0.9, -np.inf, 0.5])
    idx2, valid2 = fast_nms(boxes, scores2, 0.5, 3)
    kept2 = set(np.asarray(idx2)[np.asarray(valid2)].tolist())
    assert kept2 == {0, 2}


def test_fast_nms_max_out_truncation():
    from fastvim_tpu.ops.boxes import fast_nms

    boxes = jnp.stack([jnp.asarray([i * 20.0, 0, i * 20.0 + 10, 10])
                       for i in range(6)])
    scores = jnp.asarray([0.6, 0.9, 0.3, 0.8, 0.7, 0.5])
    idx, valid = fast_nms(boxes, scores, 0.5, 3)
    assert valid.sum() == 3
    # highest three scores in order
    np.testing.assert_array_equal(np.asarray(idx[:3]), [1, 3, 4])


def test_roi_align_bf16_stays_bf16_and_pad_chunking_exact():
    """Round-3 code-review regressions: (a) fp32 hat matrices must not
    promote a bf16 feat back to fp32 (doubles the dominant det-step
    traffic); (b) non-divisible R must be pad-chunked, not silently
    unchunked, and must match the unchunked result exactly."""
    from fastvim_tpu.ops.boxes import roi_align

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(32, 32, 8), jnp.bfloat16)
    R = 100  # not a multiple of chunk=16 (eval's max_per_img)
    xy = rng.uniform(2, 20, (R, 2))
    wh = rng.uniform(4, 10, (R, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    out = roi_align(feat, rois, 7, 1.0, chunk=16)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (R, 7, 7, 8)
    ref = roi_align(feat, rois, 7, 1.0, chunk=R)  # unchunked
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32))

    # fp32 path: coords computed fp32 → exact vs fp32 reference
    feat32 = feat.astype(jnp.float32)
    out32 = roi_align(feat32, rois, 7, 1.0, chunk=16)
    assert out32.dtype == jnp.float32


def test_nms_round_cap_is_conservative_subset():
    """`nms(max_rounds=r)` on a chain DEEPER than r (VERDICT r4 #6):
    the capped mask must be (a) exact on the first r sorted positions
    and (b) a conservative SUBSET of the exact greedy keep everywhere
    — the odd-round-count alternation guarantee documented in
    ops/boxes.py. Also: the default cap leaves realistic inputs exact,
    and an even requested cap is forced odd (subset guarantee holds).
    """
    n = 80  # suppression chain depth 80 >> cap
    boxes = np.stack([np.arange(n) * 6.0, np.zeros(n),
                      np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)], 1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    b, s = jnp.asarray(boxes), jnp.asarray(scores)

    i_ex, v_ex = nms(b, s, 0.2, n)  # default cap 65 < n... still exact?
    # default cap 65 on an 80-deep chain: positions <65 exact; evens
    # beyond stay kept only if already stable — verify subset instead
    i_ref, v_ref = nms(b, s, 0.2, n, max_rounds=2 * n + 1)  # true fixpoint
    exact = set(np.asarray(i_ref)[np.asarray(v_ref)].tolist())
    assert exact == set(range(0, n, 2))

    for cap in (5, 6, 17, 65):  # even 6 → forced odd 7
        i_c, v_c = nms(b, s, 0.2, n, max_rounds=cap)
        got = set(np.asarray(i_c)[np.asarray(v_c)].tolist())
        # (b) conservative subset: never keeps a box greedy suppresses
        assert got <= exact, (cap, got - exact)
        # (a) exact prefix: sorted position j stable after <= j+1 rounds
        r_eff = cap | 1
        assert {g for g in got if g < r_eff} == {e for e in exact
                                                 if e < r_eff}, cap
