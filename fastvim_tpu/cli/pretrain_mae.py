"""MAE (FastMaskVim) pretraining.

Entry point mirroring `mae/pretrain.py`:
  python -m fastvim_tpu.cli.pretrain_mae --config_name pretrain_FastVimB \
      --model_save_dir out/ [--data_dir /imagenet]
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
        make_mae_train_step,
        make_optimizer,
        scale_lr,
    )
    from fastvim_tpu.train.loop import run_training

    mesh, shard_fn = setup_mesh()
    model = create_model(
        cfg["model"], img_size=cfg["img_size"],
        # override the registered patch size when the config names one
        # (the digits64 campaign runs 64px/patch8)
        **({"patch_size": cfg["patch_size"]} if "patch_size" in cfg else {}),
        norm_pix_loss=cfg.get("norm_pix_loss", True),
        scanpath_type=cfg.get("scanpath_type", "rowwise"),
        rotate_every_block=cfg.get("rotate_every_block", True),
        collapse_method=cfg.get("collapse_method", "mean"),
        use_norm_after_ssm=cfg.get("use_norm_after_ssm", True),
        # per-model Pallas routing for the decoder's exposed full-L
        # scans (the ChannelVim lesson; benchmarks/mae_cost_tpu.py)
        pallas_min_l=cfg.get("pallas_min_l", 64),
        # opt-in fit lever for Huge-scale/long-L (measured NEGATIVE for
        # throughput at base/224: 92.2 img/s b16 vs 80.5 b16-remat vs
        # 60.2 b32-remat on 1xv5e — enable only when the batch doesn't
        # fit at all; benchmarks/family_tpu.py bench_mae_remat)
        remat=cfg.get("remat", False))

    loader = create_imagenet_loader(
        cfg["data"].get("dir"), "train", cfg["batch_size"],
        cfg["img_size"], training=True, mae=True,
        num_workers=cfg.get("num_workers", 4), seed=cfg["seed"],
        synthetic_samples=args.synthetic_samples)

    steps_per_epoch = max(len(loader), 1)
    accum = cfg.get("accum_iter", 1)
    eff_batch = cfg["batch_size"] * world_size() * accum
    base_lr = cfg["blr"] * eff_batch / 256.0  # mae_imagenet.py:106-107
    lr_schedule = cosine_with_warmup(
        base_lr, cfg.get("min_lr", 0.0),
        cfg["training_epochs"] * steps_per_epoch // accum,
        cfg["warmup_epochs"] * steps_per_epoch // accum)

    rng = jax.random.PRNGKey(cfg["seed"])
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"],
                    cfg.get("channels", 3)))
    params = model.init({"params": jax.random.PRNGKey(cfg["seed"] + 1),
                         "mask": jax.random.PRNGKey(cfg["seed"] + 2)}, x0)
    tx = make_optimizer(lr_schedule, weight_decay=cfg["weight_decay"],
                        params=params, betas=(0.9, 0.95),  # AdamW β per MAE
                        accum_steps=accum)
    state = TrainState.create(params, tx)
    train_step = make_mae_train_step(model,
                                     mask_ratio=cfg.get("mask_ratio", 0.75))

    state = run_training(
        state=state, train_step=train_step, train_loader=loader,
        epochs=cfg["training_epochs"], rng=rng,
        save_dir=args.model_save_dir, resume=args.resume,
        shard_fn=shard_fn)
    return state


if __name__ == "__main__":
    main()
