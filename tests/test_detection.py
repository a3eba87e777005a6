"""Detection harness tests: cascade losses, training-step loss decrease,
prediction path + box AP, LSJ data pipeline, ViTDet layer decay.

The reference delegates all of this to mmdetection
(detection/tools/train.py, cascade-mask-rcnn_r50_fpn.py); these tests
cover the TPU-native re-implementation end to end on tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastvim_tpu.data.detection import (
    DetectionLoader,
    SyntheticDetectionDataset,
    lsj_transform,
)
from fastvim_tpu.models import VisionMamba
from fastvim_tpu.models.detection import CascadeMaskRCNN

IMG = 64
MAX_GT = 4


def tiny_det_model():
    backbone = VisionMamba(img_size=IMG, patch_size=16, depth=2,
                           embed_dim=32, num_classes=0, out_indices=(1,),
                           drop_path_rate=0.0, ssm_cfg={"d_state": 4})
    return CascadeMaskRCNN(
        backbone=backbone, num_classes=3, backbone_channel=32,
        img_size=IMG, rpn_sample=16, nms_pre=32, num_proposals=16,
        rcnn_sample=16)


def tiny_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    boxes = np.zeros((B, MAX_GT, 4), np.float32)
    labels = np.zeros((B, MAX_GT), np.int32)
    masks = np.zeros((B, MAX_GT, IMG, IMG), np.uint8)
    valid = np.zeros((B, MAX_GT), bool)
    for i in range(B):
        n = 2
        for g in range(n):
            x1, y1 = rng.uniform(4, 30, 2)
            w, h = rng.uniform(12, 24, 2)
            boxes[i, g] = [x1, y1, min(x1 + w, IMG - 1),
                           min(y1 + h, IMG - 1)]
            labels[i, g] = rng.integers(0, 3)
            b = boxes[i, g].astype(int)
            masks[i, g, b[1]:b[3], b[0]:b[2]] = 1
            # paint the object into the image so boxes are learnable
            images[i, b[1]:b[3], b[0]:b[2]] += 2.0 + labels[i, g]
        valid[i, :n] = True
    return {"image": jnp.asarray(images), "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(labels), "masks": jnp.asarray(masks),
            "gt_valid": jnp.asarray(valid)}


@pytest.fixture(scope="module")
def det_setup():
    model = tiny_det_model()
    batch = tiny_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["image"], gt_boxes=batch["boxes"],
        gt_labels=batch["labels"], gt_masks=batch["masks"],
        gt_valid=batch["gt_valid"])
    return model, params, batch


def test_cascade_losses_finite_and_complete(det_setup):
    model, params, batch = det_setup
    losses = model.apply(params, batch["image"], gt_boxes=batch["boxes"],
                         gt_labels=batch["labels"],
                         gt_masks=batch["masks"],
                         gt_valid=batch["gt_valid"],
                         rngs={"sampler": jax.random.PRNGKey(2)})
    expect = {"rpn_cls", "rpn_reg", "loss"} | {
        f"s{s}_{k}" for s in range(3) for k in ("cls", "reg", "mask")}
    assert expect == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_detection_train_step_decreases_loss(det_setup):
    import optax

    from fastvim_tpu.train import TrainState

    model, params, batch = det_setup
    tx = optax.adam(1e-3)
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)

    @jax.jit
    def step(state, batch, rng):
        def loss_fn(p):
            losses = model.apply(
                p, batch["image"], gt_boxes=batch["boxes"],
                gt_labels=batch["labels"], gt_masks=batch["masks"],
                gt_valid=batch["gt_valid"], rngs={"sampler": rng})
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), losses

    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_predict_path_and_box_ap(det_setup):
    from fastvim_tpu.train.metrics import box_average_precision

    model, params, batch = det_setup
    preds = model.apply(params, batch["image"])
    B = batch["image"].shape[0]
    assert preds["boxes"].shape[0] == B
    assert preds["masks"].shape[-2:] == (28, 28)
    assert preds["boxes"].shape[1] == preds["scores"].shape[1]
    # AP helper: perfect predictions → AP 1; empty predictions → AP 0
    gts = [{"boxes": np.asarray(batch["boxes"][i]),
            "labels": np.asarray(batch["labels"][i]),
            "valid": np.asarray(batch["gt_valid"][i])} for i in range(B)]
    perfect = [{"boxes": g["boxes"], "scores": np.ones(MAX_GT),
                "labels": g["labels"], "valid": g["valid"]} for g in gts]
    assert box_average_precision(perfect, gts, 0.5, 3) == pytest.approx(1.0)
    empty = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
              "labels": np.zeros(0, np.int64)} for _ in range(B)]
    assert box_average_precision(empty, gts, 0.5, 3) == 0.0
    # untrained model's real predictions at least flow through the metric
    pred_list = [{k: np.asarray(preds[k][i])
                  for k in ("boxes", "scores", "labels", "valid")}
                 for i in range(B)]
    ap = box_average_precision(pred_list, gts, 0.5, 3)
    assert 0.0 <= ap <= 1.0


def test_lsj_transform_geometry():
    import random

    ds = SyntheticDetectionDataset(4, 64, num_classes=3)
    img, boxes, labels, masks = ds.load(0)
    image, b2, l2, m2 = lsj_transform(img, boxes, labels, masks,
                                      random.Random(0), 48,
                                      scale_range=(0.5, 1.5))
    assert image.shape == (48, 48, 3)
    assert b2.shape[1] == 4 and len(b2) == len(l2) == len(m2)
    assert (b2[:, 2] >= b2[:, 0]).all() and (b2[:, 3] >= b2[:, 1]).all()
    assert b2.max() <= 48.0
    # eval mode is deterministic and keeps every box
    e1 = lsj_transform(img, boxes, labels, masks, random.Random(1), 48,
                       training=False)
    e2 = lsj_transform(img, boxes, labels, masks, random.Random(2), 48,
                       training=False)
    np.testing.assert_array_equal(e1[1], e2[1])
    assert len(e1[1]) == len(boxes)
    # boxes stay aligned with their masks: mask bbox ≈ box
    ys, xs = np.where(e1[3][0])
    np.testing.assert_allclose(
        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], e1[1][0],
        atol=2.0)


def test_detection_loader_batch_contract():
    ds = SyntheticDetectionDataset(8, 64, num_classes=3)
    dl = DetectionLoader(ds, batch_size=4, img_size=64, max_gt=MAX_GT,
                         training=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["boxes"].shape == (4, MAX_GT, 4)
    assert b["masks"].shape == (4, MAX_GT, 64, 64)
    assert b["gt_valid"].any()


def test_vitdet_layer_decay_rule():
    """ViTDet rule (layer_decay_optimizer_constructor.py:12-32,83):
    patch_embed/pos_embed → decay^(N+1), block i → decay^(N-i),
    non-backbone → 1."""
    from fastvim_tpu.train.optim import vitdet_layer_decay_scales

    params = {"params": {
        "backbone": {
            "patch_embed": {"proj": {"kernel": jnp.zeros((2, 2))}},
            "pos_embed": jnp.zeros((1, 4, 8)),
            "layers_0": {"mixer": {"A_log": jnp.zeros((2, 2))}},
            "layers_11": {"norm_weight": jnp.zeros((8,))},
        },
        "neck": {"lateral_0": {"kernel": jnp.zeros((1, 1))}},
        "rpn": {"rpn_cls": {"kernel": jnp.zeros((1, 1))}},
    }}
    s = vitdet_layer_decay_scales(params, 0.7, num_layers=12)
    p = s["params"]
    assert p["backbone"]["patch_embed"]["proj"]["kernel"] == \
        pytest.approx(0.7 ** 13)
    assert p["backbone"]["pos_embed"] == pytest.approx(0.7 ** 13)
    assert p["backbone"]["layers_0"]["mixer"]["A_log"] == \
        pytest.approx(0.7 ** 12)
    assert p["backbone"]["layers_11"]["norm_weight"] == \
        pytest.approx(0.7 ** 1)
    assert p["neck"]["lateral_0"]["kernel"] == 1.0
    assert p["rpn"]["rpn_cls"]["kernel"] == 1.0


def test_scan_stages_stacked_params_and_grads(det_setup):
    """Scan-over-stages (VERDICT r3 #6): the 3 bbox heads live as ONE
    stacked (3, ...) tree under "stages/head", the stage slices are
    independently initialized, and gradients flow to EVERY stage slice
    (a broken scan would zero later stages)."""
    model, params, batch = det_setup
    head = params["params"]["stages"]["head"]
    k = head["fc1"]["kernel"]
    assert k.shape[0] == 3
    # per-stage init differs (split_rngs={"params": True})
    assert not np.allclose(np.asarray(k[0]), np.asarray(k[1]))

    def loss_fn(p):
        return model.apply(
            p, batch["image"], gt_boxes=batch["boxes"],
            gt_labels=batch["labels"], gt_masks=batch["masks"],
            gt_valid=batch["gt_valid"],
            rngs={"sampler": jax.random.PRNGKey(3)})["loss"]

    grads = jax.grad(loss_fn)(params)
    gk = np.asarray(grads["params"]["stages"]["head"]["fc1"]["kernel"])
    for s in range(3):
        assert np.abs(gk[s]).max() > 0, f"stage {s} got zero grads"
