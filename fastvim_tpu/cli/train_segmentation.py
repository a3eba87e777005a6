"""ADE20K semantic segmentation training (UperNet over FastVim).

Entry point mirroring `segmentation/tools/train.py` + the mmseg dataset
config (segmentation/configs/_base_/datasets/ade20k.py): real ADE20K
folder data (or synthetic fallback), poly LR, AdamW with SSM no-decay
keys, FCN aux loss, periodic slide-inference mIoU eval, checkpoint-in →
mIoU-out with --eval_only.

  python -m fastvim_tpu.cli.train_segmentation \
      --config_name upernet_FastVimT_ade20k --model_save_dir out/ \
      --data_dir /data/ADEChallengeData2016 \
      [pretrained_checkpoint_path=/ckpt]
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from fastvim_tpu.cli.common import base_parser, load_cli_config, setup_mesh


def poly_schedule(base_lr, total_iters, power=1.0, min_lr=0.0,
                  warmup_iters=1500, warmup_ratio=1e-6):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio)
                          * step / max(warmup_iters, 1))
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        main = (base_lr - min_lr) * (1 - t) ** power + min_lr
        return jnp.where(step < warmup_iters, warm, main)

    return schedule


def evaluate_miou(seg, params, val_loader, num_classes: int,
                  crop: int, use_slide: bool = True) -> float:
    """Slide-inference mIoU over a loader (the reference's slide test
    mode, seg config :42-76 + mmseg IoUMetric)."""
    from fastvim_tpu.models.upernet import slide_inference
    from fastvim_tpu.train.metrics import (
        confusion_matrix,
        miou_from_confusion,
    )

    @jax.jit
    def window_logits(images):
        return seg.apply(params, images, deterministic=True)

    @jax.jit
    def cm_batch(logits, labels):
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, labels, num_classes)

    cm = np.zeros((num_classes, num_classes), np.float64)
    for batch in val_loader:
        images = jnp.asarray(batch["image"])
        H, W = images.shape[1:3]
        if use_slide and (H > crop or W > crop):
            logits = slide_inference(window_logits, images, crop=crop,
                                     stride=int(crop * 2 / 3),
                                     num_classes=num_classes)
        else:
            logits = window_logits(images)
        cm += np.asarray(cm_batch(logits, jnp.asarray(batch["label"])),
                         np.float64)
    return float(miou_from_confusion(jnp.asarray(cm)))


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--total_iters", type=int, default=None)
    p.add_argument("--eval_only", action="store_true",
                   help="checkpoint-in → mIoU-out, no training")
    p.add_argument("--eval_every", type=int, default=16000,
                   help="iterations between mIoU evals (schedule_160k.py"
                   " CheckpointHook interval)")
    args = p.parse_args(argv)
    cfg = load_cli_config(args, "segmentation")

    from fastvim_tpu.data.segmentation import create_segmentation_loader
    from fastvim_tpu.models import create_model
    from fastvim_tpu.models.upernet import (
        UperNetSegmentor,
        segmentation_loss,
    )
    from fastvim_tpu.train import TrainState, make_optimizer
    from fastvim_tpu.train.checkpoint import (
        latest_checkpoint,
        load_pretrained_backbone,
        restore_checkpoint,
        save_checkpoint,
    )
    from fastvim_tpu.train.loop import CSVLogger

    mesh, shard_fn = setup_mesh()
    backbone = create_model(
        cfg["model"], img_size=cfg["img_size"], num_classes=0,
        drop_path_rate=0.0, out_indices=tuple(cfg["out_indices"]),
        layer_fused=cfg.get("layer_fused", "auto"))
    seg = UperNetSegmentor(
        backbone=backbone, num_classes=cfg["num_classes"],
        aux_index=cfg.get("aux_index", 2),
        # "bn" = the reference's SyncBN decode-head recipe
        # (upernet_vim.py norm_cfg); "ln" is the documented default
        norm=cfg.get("head_norm", "ln"))

    size = cfg["img_size"]
    x0 = jnp.zeros((2, size, size, 3))
    params = seg.init(jax.random.PRNGKey(0), x0, with_aux=True)
    ckpt = cfg.get("pretrained_checkpoint_path")
    if ckpt:
        params = load_pretrained_backbone(
            ckpt, params, prefer_ema=cfg.get("load_ema", True),
            subtree="backbone")

    data_dir = cfg.get("data", {}).get("dir")
    num_workers = cfg.get("num_workers", 2)
    val_loader = create_segmentation_loader(
        data_dir, "validation", cfg.get("eval_batch_size", 1), size,
        training=False, num_classes=cfg["num_classes"],
        num_workers=num_workers,
        synthetic_samples=min(args.synthetic_samples, 8))

    if args.eval_only:
        if args.model_save_dir:
            path = latest_checkpoint(os.path.join(args.model_save_dir,
                                                  "ckpt"))
            if path:
                params = restore_checkpoint(path)["params"]
        miou = evaluate_miou(seg, params, val_loader, cfg["num_classes"],
                             size)
        print({"mIoU": miou})
        return miou

    train_loader = create_segmentation_loader(
        data_dir, "training", cfg.get("batch_size", 2), size,
        training=True, num_classes=cfg["num_classes"],
        num_workers=num_workers,
        synthetic_samples=args.synthetic_samples)

    total = args.total_iters or cfg.get("total_iters", 160000)
    opt_cfg = cfg.get("optimizer", {})
    sched_cfg = cfg.get("lr_schedule", {})
    lr = poly_schedule(opt_cfg.get("lr", 6e-5), total,
                       sched_cfg.get("power", 1.0),
                       sched_cfg.get("min_lr", 0.0),
                       sched_cfg.get("warmup_iters", 1500),
                       sched_cfg.get("warmup_ratio", 1e-6))
    tx = make_optimizer(lr, weight_decay=opt_cfg.get("weight_decay", 0.01),
                        params=params)
    state = TrainState.create(params, tx)
    if args.resume and args.model_save_dir:
        path = latest_checkpoint(os.path.join(args.model_save_dir, "ckpt"))
        if path:
            restored = restore_checkpoint(path, template={
                "params": state.params, "opt_state": state.opt_state,
                "step": np.asarray(0)})
            state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=jnp.asarray(int(restored["step"])))

    has_bn = "batch_stats" in params

    @jax.jit
    def train_step(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(pp):
            variables = dict(state.params, params=pp)
            if has_bn:
                (logits, aux), upd = seg.apply(
                    variables, batch["image"], deterministic=False,
                    with_aux=True, rngs=rngs, mutable=["batch_stats"])
                new_bs = upd["batch_stats"]
            else:
                logits, aux = seg.apply(
                    variables, batch["image"], deterministic=False,
                    with_aux=True, rngs=rngs)
                new_bs = None
            return segmentation_loss(logits, batch["label"], aux), new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params["params"])
        grads = {**jax.tree_util.tree_map(jnp.zeros_like, state.params),
                 "params": grads}
        state = state.apply_gradients(grads)
        if has_bn:
            state = state.replace(
                params={**state.params, "batch_stats": new_bs})
        return state, {"train_loss": loss}

    logger = (CSVLogger(os.path.join(args.model_save_dir, "log.csv"))
              if args.model_save_dir else None)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    step_count = int(state.step)
    while step_count < total:
        for batch in train_loader:
            if step_count >= total:
                break
            state, m = train_step(state, shard_fn(batch), rng)
            step_count += 1
            if step_count % 50 == 0 or step_count == total:
                print({"iter": step_count,
                       "train_loss": float(m["train_loss"])})
            if step_count % args.eval_every == 0 or step_count == total:
                miou = evaluate_miou(seg, state.params, val_loader,
                                     cfg["num_classes"], size)
                row = {"iter": step_count, "mIoU": miou,
                       "train_loss": float(m["train_loss"])}
                print(row)
                if logger:
                    logger.log(row)
                if args.model_save_dir:
                    save_checkpoint(
                        os.path.join(args.model_save_dir, "ckpt"), state)
        else:
            continue
        break
    if args.model_save_dir:
        save_checkpoint(os.path.join(args.model_save_dir, "ckpt"), state)
    return state


if __name__ == "__main__":
    main()
