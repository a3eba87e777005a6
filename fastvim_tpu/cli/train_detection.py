"""COCO detection training: FastVim backbone + ViTDet cascade Mask R-CNN.

Entry point mirroring `detection/tools/train.py` (driven by the mmengine
configs at detection/configs/FastVim/): ViTDet per-layer LR decay 0.7
(vitdet/layer_decay_optimizer_constructor.py), AdamW lr 1e-4 wd 0.05,
LinearLR 250-iter warmup + MultiStep ×0.1 (lsj-100e_coco-instance.py:
82-113), LSJ-1024 data (COCO folder or synthetic), optional bf16
gradient all-reduce (fp16_compression_hook equivalent).

  python -m fastvim_tpu.cli.train_detection --config_name \
      vitdet_FastVimB_coco --data_dir /data/coco
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fastvim_tpu.cli.common import (
    base_parser,
    load_cli_config,
    setup_mesh,
)


def build_model(cfg):
    from fastvim_tpu.models import create_model
    from fastvim_tpu.models.detection import CascadeMaskRCNN

    depth = cfg.get("depth")
    out_indices = cfg.get("out_indices")
    dtype = jnp.bfloat16 if cfg.get("dtype") == "bf16" else jnp.float32
    backbone = create_model(
        cfg["model"], img_size=cfg["img_size"],
        patch_size=cfg.get("patch_size", 16), num_classes=0,
        drop_path_rate=cfg.get("drop_path_rate", 0.0), dtype=dtype,
        layer_fused=cfg.get("layer_fused", "auto"),
        out_indices=tuple(out_indices) if out_indices else None)
    embed_dim = getattr(backbone, "embed_dim")
    if depth is None:
        depth = getattr(backbone, "depth")
    det_cfg = cfg.get("det", {})
    model = CascadeMaskRCNN(
        backbone=backbone,
        num_classes=cfg.get("num_classes", 80),
        backbone_channel=embed_dim,
        img_size=cfg["img_size"],
        rpn_sample=det_cfg.get("rpn_sample", 256),
        nms_pre=det_cfg.get("nms_pre", 1000),
        num_proposals=det_cfg.get("num_proposals", 512),
        rcnn_sample=det_cfg.get("rcnn_sample", 512),
        dtype=dtype,
    )
    return model, depth


def evaluate_box_ap(model, params, val_loader, num_classes: int,
                    iou_thr: float = 0.5) -> dict:
    """bbox + segm AP@iou_thr over a loader (mmdet CocoMetric
    counterpart, single-threshold)."""
    import jax as _jax
    import numpy as np

    from fastvim_tpu.train.metrics import (
        box_average_precision,
        mask_average_precision,
    )

    predict = _jax.jit(lambda p, x: model.apply(p, x))
    preds, gts = [], []
    for batch in val_loader:
        out = predict(params, batch["image"])
        B = batch["image"].shape[0]
        for i in range(B):
            preds.append({k: np.asarray(out[k][i])
                          for k in ("boxes", "scores", "labels", "valid",
                                    "masks")})
            gts.append({"boxes": np.asarray(batch["boxes"][i]),
                        "labels": np.asarray(batch["labels"][i]),
                        "masks": np.asarray(batch["masks"][i]),
                        "valid": np.asarray(batch["gt_valid"][i])})
    return {
        "box_ap50": box_average_precision(preds, gts, iou_thr,
                                          num_classes),
        "mask_ap50": mask_average_precision(preds, gts, iou_thr,
                                            num_classes),
    }


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--eval_only", action="store_true",
                   help="checkpoint-in → box-AP-out, no training")
    args = p.parse_args(argv)
    cfg = load_cli_config(args, "detection")

    from fastvim_tpu.data.detection import create_detection_loader
    from fastvim_tpu.train import TrainState, make_optimizer
    from fastvim_tpu.train.checkpoint import load_pretrained_backbone
    from fastvim_tpu.train.loop import run_training
    from fastvim_tpu.train.optim import vitdet_layer_decay_scales
    from fastvim_tpu.train.schedules import warmup_multistep

    mesh, shard_fn = setup_mesh()
    model, depth = build_model(cfg)

    max_gt = cfg.get("max_gt", 32)
    train_loader = create_detection_loader(
        cfg.get("data", {}).get("dir"), "train", cfg["batch_size"],
        cfg["img_size"], training=True, max_gt=max_gt,
        num_workers=cfg.get("num_workers", 4), seed=cfg.get("seed", 0),
        synthetic_samples=args.synthetic_samples,
        num_classes=cfg.get("num_classes", 80))

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    x0 = jnp.zeros((1, cfg["img_size"], cfg["img_size"], 3))
    g0 = dict(gt_boxes=jnp.zeros((1, max_gt, 4)),
              gt_labels=jnp.zeros((1, max_gt), jnp.int32),
              gt_masks=jnp.zeros((1, max_gt, cfg["img_size"],
                                  cfg["img_size"]), jnp.uint8),
              gt_valid=jnp.zeros((1, max_gt), bool))
    params = model.init({"params": rng, "sampler": rng}, x0, **g0,
                        deterministic=True)
    if cfg.get("pretrained_checkpoint_path"):
        params = load_pretrained_backbone(
            cfg["pretrained_checkpoint_path"], params,
            prefer_ema=cfg.get("load_ema", True), subtree="backbone")

    if args.eval_only:
        import os

        from fastvim_tpu.train.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
        )

        if args.model_save_dir:
            path = latest_checkpoint(os.path.join(args.model_save_dir,
                                                  "ckpt"))
            if path:
                params = restore_checkpoint(path)["params"]
        val_loader = create_detection_loader(
            cfg.get("data", {}).get("dir"), "val",
            cfg.get("eval_batch_size", 1), cfg["img_size"],
            training=False, max_gt=max_gt,
            num_workers=cfg.get("num_workers", 4),
            synthetic_samples=min(args.synthetic_samples, 8),
            num_classes=cfg.get("num_classes", 80))
        metrics = evaluate_box_ap(model, params, val_loader,
                                  cfg.get("num_classes", 80))
        print(metrics)
        return metrics

    steps_per_epoch = max(len(train_loader), 1)
    total_iters = cfg.get("total_iters", 184375)
    epochs = cfg.get("training_epochs") or -(-total_iters
                                             // steps_per_epoch)
    opt = cfg.get("optimizer", {})
    lr_schedule = warmup_multistep(
        opt.get("lr", 1e-4), warmup_steps=cfg.get("warmup_iters", 250),
        milestones=cfg.get("milestones", [163889, 177546]))
    scales = vitdet_layer_decay_scales(
        params, opt.get("layer_decay", 0.7), num_layers=depth)
    tx = make_optimizer(lr_schedule,
                        weight_decay=opt.get("weight_decay", 0.05),
                        params=params, layer_scales=scales)
    state = TrainState.create(params, tx)

    grad_dtype = (jnp.bfloat16
                  if cfg.get("grad_compression") == "bf16"
                  and mesh.shape.get("data", 1) > 1 else None)

    def loss_fn(params, batch, rng):
        r_samp, r_drop = jax.random.split(rng)
        losses = model.apply(
            params, batch["image"], gt_boxes=batch["boxes"],
            gt_labels=batch["labels"], gt_masks=batch["masks"],
            gt_valid=batch["gt_valid"], deterministic=False,
            rngs={"sampler": r_samp, "dropout": r_drop})
        return losses["loss"], losses

    if grad_dtype is not None:
        from fastvim_tpu.train.trainer import make_compressed_grads_fn

        grads_fn = make_compressed_grads_fn(loss_fn, mesh, grad_dtype)
    else:
        def grads_fn(params, batch, rng):
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            return losses, grads

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        losses, grads = grads_fn(state.params, batch, step_rng)
        state = state.apply_gradients(grads)
        return state, {f"train_{k}": v for k, v in losses.items()}

    state = run_training(
        state=state, train_step=train_step, train_loader=train_loader,
        epochs=epochs, rng=rng, save_dir=args.model_save_dir,
        resume=args.resume, shard_fn=shard_fn)
    return state


if __name__ == "__main__":
    main()
