"""MAE→supervised finetuning with layer-wise LR decay and
scaling_factor=0.25.

Entry point mirroring `mae/finetune.py`:
  python -m fastvim_tpu.cli.finetune_mae --config_name finetune_FastVimB \
      --model_save_dir out/ pretrained_checkpoint_path=/path/to/ckpt
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastvim_tpu.cli.common import (
    base_parser,
    load_cli_config,
    setup_mesh,
    world_size,
)


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = load_cli_config(args, "mae")

    from fastvim_tpu.data import create_imagenet_loader
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_eval_step,
        make_supervised_train_step,
    )
    from fastvim_tpu.train.checkpoint import load_pretrained_backbone
    from fastvim_tpu.train.loop import run_training

    mesh, shard_fn = setup_mesh()
    model = create_model(
        cfg["model"], img_size=cfg["img_size"],
        num_classes=cfg["num_classes"],
        **({"patch_size": cfg["patch_size"]} if "patch_size" in cfg else {}),
        drop_path_rate=cfg.get("drop_path_rate", 0.3),
        scaling_factor=cfg.get("scaling_factor", 0.25),
        scanpath_type=cfg.get("scanpath_type", "rowwise"),
        collapse_method=cfg.get("collapse_method", "mean"),
        layer_fused=cfg.get("layer_fused", "auto"),
        remat=cfg.get("remat", False))  # fit lever for Huge-scale

    train_loader = create_imagenet_loader(
        cfg["data"].get("dir"), "train", cfg["batch_size"],
        cfg["img_size"], training=True, seed=cfg["seed"],
        synthetic_samples=args.synthetic_samples)
    val_loader = create_imagenet_loader(
        cfg["data"].get("dir"), "val", cfg["batch_size"], cfg["img_size"],
        training=False, synthetic_samples=args.synthetic_samples)

    rng = jax.random.PRNGKey(cfg["seed"])
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"], 3))
    params = model.init(jax.random.PRNGKey(cfg["seed"] + 1), x0)

    ckpt = cfg.get("pretrained_checkpoint_path")
    if ckpt:
        grid = cfg["img_size"] // cfg["patch_size"]
        # pretrain resolution defaults to the reference's 224; override
        # when finetuning from a non-224 pretrain (e.g. digits64)
        pre_img = cfg.get("pretrain_img_size", 224)
        params = load_pretrained_backbone(
            ckpt, params, prefer_ema=False, new_grid=(grid, grid),
            old_grid=(pre_img // cfg["patch_size"],
                      pre_img // cfg["patch_size"]),
            scanpath_type=cfg.get("scanpath_type", "rowwise"))

    steps_per_epoch = max(len(train_loader), 1)
    eff_batch = cfg["batch_size"] * world_size()
    base_lr = cfg["blr"] * eff_batch / 256.0
    lr_schedule = cosine_with_warmup(
        base_lr, cfg.get("min_lr", 1e-5),
        cfg["training_epochs"] * steps_per_epoch,
        cfg["warmup_epochs"] * steps_per_epoch)

    clip = cfg.get("gradient_clip_val", -1)
    tx = make_optimizer(
        lr_schedule, weight_decay=cfg["weight_decay"], params=params,
        layer_decay=cfg.get("layer_decay", 0.65), depth=model.depth,
        grad_clip=None if clip is None or clip < 0 else clip)
    state = TrainState.create(params, tx, ema=False)

    # gate like train_classification.py: beta(0,0) sampling is NaN, so
    # mixup/cutmix must be OFF (config=None) when both alphas are 0
    mixup_cfg = None
    if cfg.get("mixup", 0.8) or cfg.get("cutmix", 1.0):
        mixup_cfg = dict(mixup_alpha=cfg.get("mixup", 0.8),
                         cutmix_alpha=cfg.get("cutmix", 1.0),
                         prob=cfg.get("mixup_prob", 1.0),
                         switch_prob=cfg.get("mixup_switch_prob", 0.5))
    train_step = make_supervised_train_step(
        model, cfg["num_classes"], mixup_config=mixup_cfg,
        label_smoothing=cfg.get("label_smoothing", 0.1), ema_decay=None)
    eval_step = make_supervised_eval_step(model)

    state = run_training(
        state=state, train_step=train_step, train_loader=train_loader,
        epochs=cfg["training_epochs"], rng=rng, eval_step=eval_step,
        eval_loader=val_loader, save_dir=args.model_save_dir,
        resume=args.resume, shard_fn=shard_fn)
    return state


if __name__ == "__main__":
    main()
