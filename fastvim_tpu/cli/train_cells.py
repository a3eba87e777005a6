"""JUMP-CP cell-imaging classification (FastChannelVim).

Entry point mirroring `cell_imaging/train.py`:
  python -m fastvim_tpu.cli.train_cells --config_name FastChannelVimS \
      --model_save_dir out/ [data.manifest=/path/manifest.parquet]

HCS (hierarchical channel sampling) runs host-side per batch; jit
re-specializes per channel count (bucketed static shapes, ≤ channels
compilations).
"""

from __future__ import annotations

import numpy as np

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
    cfg = load_cli_config(args, "cells")

    from fastvim_tpu.data.cells import (
        CellDataset,
        CellLoader,
        SyntheticCellDataset,
    )
    from fastvim_tpu.models import create_model
    from fastvim_tpu.models.channel import hcs_sample
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_eval_step,
        make_supervised_train_step,
        scale_lr,
    )
    from fastvim_tpu.train.loop import run_training

    mesh, shard_fn = setup_mesh()
    num_ch = cfg.get("channels", 8)
    model = create_model(
        cfg["model"], img_size=cfg["img_size"],
        num_classes=cfg["num_classes"], channels=num_ch,
        drop_path_rate=cfg.get("drop_path_rate", 0.05),
        scan_order=cfg.get("scan_order", "Channel-First"),
        scanpath_type=cfg.get("scanpath_type", "rowwise"),
        collapse_method=cfg.get("collapse_method", "mean"),
        remat=cfg.get("remat", False))  # fit lever (ps8 × many channels)

    manifest = cfg["data"].get("manifest")
    if manifest:
        train_ds = CellDataset(manifest, "train", cfg["seed"])
        val_ds = CellDataset(manifest, "val", cfg["seed"])
    else:
        train_ds = SyntheticCellDataset(
            args.synthetic_samples, cfg["img_size"], num_ch,
            cfg["num_classes"])
        val_ds = SyntheticCellDataset(
            args.synthetic_samples // 4, cfg["img_size"], num_ch,
            cfg["num_classes"])
    mean = cfg["data"].get("normalization_mean")
    std = cfg["data"].get("normalization_std")
    train_loader = CellLoader(train_ds, cfg["batch_size"], cfg["img_size"],
                              training=True, seed=cfg["seed"],
                              mean=mean, std=std)
    val_loader = CellLoader(val_ds, cfg["batch_size"], cfg["img_size"],
                            training=False, mean=mean, std=std)

    steps_per_epoch = max(len(train_loader), 1)
    base_lr = scale_lr(cfg["lr"], cfg["batch_size"], world_size(),
                       cfg.get("scaling_rule", "linear"))
    total = cfg["training_epochs"] * steps_per_epoch
    lr_schedule = cosine_with_warmup(
        base_lr, cfg["min_lr"], total,
        cfg["warmup_epochs"] * steps_per_epoch,
        cfg.get("warmup_initial_lr", 0.0))
    # WD cosine schedule (cell_imaging/utils.py:137)
    wd_schedule = cosine_with_warmup(
        cfg["weight_decay"], cfg.get("weight_decay_end",
                                     cfg["weight_decay"]), total)

    rng = jax.random.PRNGKey(cfg["seed"])
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"], num_ch))
    params = model.init(jax.random.PRNGKey(cfg["seed"] + 1), x0)
    tx = make_optimizer(lr_schedule, params=params,
                        wd_schedule=wd_schedule)
    state = TrainState.create(params, tx, ema=False)

    train_step = make_supervised_train_step(
        model, cfg["num_classes"], mixup_config=None,
        label_smoothing=cfg.get("label_smoothing", 0.0), ema_decay=None,
        channel_model=True)
    eval_step = make_supervised_eval_step(model, channel_model=True)

    use_hcs = cfg.get("hcs", True)
    hcs_rng = np.random.default_rng(cfg["seed"])

    class HCSLoader:
        """Wraps the loader, subsetting channels per batch (HCS)."""

        def __init__(self, loader, training):
            self.loader = loader
            self.training = training

        def __len__(self):
            return len(self.loader)

        def __iter__(self):
            for batch in self.loader:
                if self.training and use_hcs:
                    chans = hcs_sample(int(hcs_rng.integers(2**31)),
                                       num_ch)
                    batch = {
                        "image": batch["image"][..., chans],
                        "label": batch["label"],
                        "channel_ids": np.asarray(chans, np.int32),
                    }
                yield batch

    state = run_training(
        state=state, train_step=train_step,
        train_loader=HCSLoader(train_loader, True),
        epochs=cfg["training_epochs"], rng=rng, eval_step=eval_step,
        eval_loader=HCSLoader(val_loader, False),
        save_dir=args.model_save_dir, resume=args.resume,
        shard_fn=shard_fn)
    return state


if __name__ == "__main__":
    main()
