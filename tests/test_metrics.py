"""Metric tests: mIoU vs hand computation, box IoU."""

import jax.numpy as jnp
import numpy as np

from fastvim_tpu.train.metrics import (
    box_iou,
    confusion_matrix,
    miou_from_confusion,
)


def test_miou_perfect_and_mixed():
    label = jnp.array([[0, 0, 1, 1], [2, 2, 255, 255]])
    pred_perfect = jnp.where(label == 255, 0, label)
    cm = confusion_matrix(pred_perfect, label, 3)
    assert float(miou_from_confusion(cm)) == 1.0

    pred = jnp.array([[0, 1, 1, 1], [2, 0, 0, 0]])
    cm = confusion_matrix(pred, label, 3)
    # class0: inter 1, union 1(gt)+? pred0 count among valid: positions
    # (0,0) and (1,1): union = 2+2-1 = 3 → 1/3; class1: inter 2, union
    # 3+2-2=3 → 2/3; class2: inter 1, union 2+1-1=2 → 1/2
    want = (1 / 3 + 2 / 3 + 1 / 2) / 3
    np.testing.assert_allclose(float(miou_from_confusion(cm)), want,
                               rtol=1e-5)


def test_box_iou():
    a = jnp.array([[0, 0, 2, 2]], jnp.float32)
    b = jnp.array([[1, 1, 3, 3], [0, 0, 2, 2]], jnp.float32)
    iou = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]), [1 / 7, 1.0],
                               rtol=1e-5)


def test_coco_map_perfect_predictions():
    import numpy as np

    from fastvim_tpu.train.metrics import box_average_precision, coco_map

    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40.]]),
            "labels": np.array([0, 1])}]
    preds = [{"boxes": gts[0]["boxes"], "scores": np.ones(2),
              "labels": gts[0]["labels"]}]
    m = coco_map(preds, gts, num_classes=2)
    # 1.0 up to the pycocotools np.spacing(1) precision convention
    # (pycocotools itself reports 0.9999999999999998 here)
    for k in ("mAP", "AP50", "AP75"):
        assert abs(m[k] - 1.0) < 1e-12
    # adjacent same-class objects: second pred matches the unmatched gt
    gts2 = [{"boxes": np.array([[0, 0, 10, 10], [2, 0, 12, 10.]]),
             "labels": np.array([0, 0])}]
    preds2 = [{"boxes": np.array([[0, 0, 10, 10], [1, 0, 11, 10.]]),
               "scores": np.array([0.9, 0.8]),
               "labels": np.array([0, 0])}]
    ap = box_average_precision(preds2, gts2, 0.5, 1)
    assert ap == 1.0


def test_mask_average_precision_perfect_and_paste():
    import numpy as np

    from fastvim_tpu.train.metrics import (
        mask_average_precision,
        paste_mask,
    )

    # paste: a full-ones 4x4 mask into box [2,3,8,9] of a 12x12 canvas
    canvas = paste_mask(np.ones((4, 4)), [2, 3, 8, 9], 12, 12)
    assert canvas[3:9, 2:8].all()
    assert canvas.sum() == 36

    # perfect instance predictions → AP 1
    H = W = 16
    gm = np.zeros((2, H, W), np.uint8)
    gm[0, 2:8, 2:8] = 1
    gm[1, 10:14, 10:14] = 1
    gts = [{"boxes": np.array([[2, 2, 8, 8], [10, 10, 14, 14.]]),
            "labels": np.array([0, 0]), "masks": gm}]
    preds = [{"boxes": gts[0]["boxes"], "scores": np.ones(2),
              "labels": gts[0]["labels"],
              "masks": np.ones((2, 28, 28))}]
    ap = mask_average_precision(preds, gts, 0.5, 1)
    assert ap == 1.0
    # shifted masks that miss the IoU threshold → AP 0
    bad = [{"boxes": np.array([[9, 9, 15, 15], [0, 0, 4, 4.]]),
            "scores": np.ones(2), "labels": np.array([0, 0]),
            "masks": np.ones((2, 28, 28))}]
    assert mask_average_precision(bad, gts, 0.9, 1) == 0.0


def test_paste_mask_off_canvas_boxes():
    """Boxes partly or fully outside the canvas clip instead of crashing
    (code-review r2 pass-2 finding)."""
    import numpy as np

    from fastvim_tpu.train.metrics import paste_mask

    # fully above the canvas
    assert paste_mask(np.ones((4, 4)), [5, -20, 11, -10], 12, 12).sum() == 0
    # fully left
    assert paste_mask(np.ones((4, 4)), [-9, 2, -3, 8], 12, 12).sum() == 0
    # partly off the top-left: clipped region only
    c = paste_mask(np.ones((4, 4)), [-2, -2, 4, 4], 12, 12)
    assert c[:4, :4].sum() == c.sum() > 0
