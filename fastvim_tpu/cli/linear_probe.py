"""MAE linear probe: frozen backbone + BN(affine=False) + Linear head.

Entry point mirroring `mae/linear.py`:
  python -m fastvim_tpu.cli.linear_probe --config_name linear_FastVimL \
      pretrained_checkpoint_path=/path/to/ckpt
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastvim_tpu.cli.common import (
    base_parser,
    load_cli_config,
    setup_mesh,
    world_size,
)


class ProbeHead(nn.Module):
    """BatchNorm1d(affine=False) + Linear (mae/linear_imagenet.py:39-53).

    Matches torch BN1d semantics: batch statistics (and a running-stats
    EMA update) during training, running statistics at eval — so probe
    accuracy is independent of the eval batch size."""

    num_classes: int

    @nn.compact
    def __call__(self, feats, train: bool = True):
        normed = nn.BatchNorm(
            use_running_average=not train, use_bias=False, use_scale=False,
            momentum=0.9, epsilon=1e-6, name="bn")(feats)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.truncated_normal(0.01),
                        name="head")(normed)


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = load_cli_config(args, "mae")

    from fastvim_tpu.data import create_imagenet_loader
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        accuracy,
        cosine_with_warmup,
        cross_entropy,
        make_sgd,
    )
    from fastvim_tpu.train.checkpoint import load_pretrained_backbone
    from fastvim_tpu.train.loop import run_training

    mesh, shard_fn = setup_mesh()
    backbone = create_model(
        cfg["model"], img_size=cfg["img_size"], num_classes=0,
        **({"patch_size": cfg["patch_size"]} if "patch_size" in cfg else {}),
        drop_path_rate=0.0, scaling_factor=cfg.get("scaling_factor", 0.25),
        layer_fused=cfg.get("layer_fused", "auto"))
    head = ProbeHead(cfg["num_classes"])

    train_loader = create_imagenet_loader(
        cfg["data"].get("dir"), "train", cfg["batch_size"],
        cfg["img_size"], training=True, mae=True, seed=cfg["seed"],
        synthetic_samples=args.synthetic_samples)
    val_loader = create_imagenet_loader(
        cfg["data"].get("dir"), "val", cfg["batch_size"], cfg["img_size"],
        training=False, synthetic_samples=args.synthetic_samples)

    rng = jax.random.PRNGKey(cfg["seed"])
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"], 3))
    bb_params = backbone.init(jax.random.PRNGKey(cfg["seed"] + 1), x0)
    if cfg.get("pretrained_checkpoint_path"):
        bb_params = load_pretrained_backbone(
            cfg["pretrained_checkpoint_path"], bb_params, prefer_ema=False)
    feats0 = backbone.apply(bb_params, x0, return_features=True)
    head_params = head.init(jax.random.PRNGKey(cfg["seed"] + 2), feats0)

    steps_per_epoch = max(len(train_loader), 1)
    eff_batch = cfg["batch_size"] * world_size()
    base_lr = cfg["blr"] * eff_batch / 256.0
    lr_schedule = cosine_with_warmup(
        base_lr, cfg.get("min_lr", 0.0),
        cfg["training_epochs"] * steps_per_epoch,
        cfg["warmup_epochs"] * steps_per_epoch)
    tx = make_sgd(lr_schedule, momentum=cfg.get("momentum", 0.9),
                  weight_decay=cfg.get("weight_decay", 0.0))
    state = TrainState.create(head_params, tx)

    # backbone params ride as a jit ARGUMENT, not a closure constant:
    # constants are baked into the program (new checkpoint = full remote
    # recompile; big models also blow the relay's HTTP body cap)
    @jax.jit
    def _train_step(state, bb_params, batch, rng):
        feats = jax.lax.stop_gradient(
            backbone.apply(bb_params, batch["image"], return_features=True))
        bstats = state.params["batch_stats"]

        def loss_fn(p):
            logits, upd = head.apply(
                {"params": p, "batch_stats": bstats}, feats, train=True,
                mutable=["batch_stats"])
            return cross_entropy(logits, batch["label"]), (
                logits, upd["batch_stats"])

        (loss, (logits, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params["params"])
        # batch_stats update flows through the mutable collection, not
        # gradients — zero grads keep the optimizer state consistent
        grads = {"params": grads,
                 "batch_stats": jax.tree_util.tree_map(jnp.zeros_like,
                                                       bstats)}
        state = state.apply_gradients(grads)
        state = state.replace(
            params={**state.params, "batch_stats": new_bstats})
        return state, {"train_loss": loss,
                       "train_acc": accuracy(logits, batch["label"])}

    @jax.jit
    def _eval_step(head_params, bb_params, batch):
        feats = backbone.apply(bb_params, batch["image"],
                               return_features=True)
        logits = head.apply(head_params, feats, train=False)
        return {"loss": cross_entropy(logits, batch["label"]),
                "acc": accuracy(logits, batch["label"])}

    # adapt to run_training's (state, batch, rng)/(params, batch)
    # signatures while keeping bb_params a device argument
    def train_step(state, batch, rng):
        return _train_step(state, bb_params, batch, rng)

    def eval_step(head_params, batch):
        return _eval_step(head_params, bb_params, batch)

    state = run_training(
        state=state, train_step=train_step, train_loader=train_loader,
        epochs=cfg["training_epochs"], rng=rng, eval_step=eval_step,
        eval_loader=val_loader, save_dir=args.model_save_dir,
        resume=args.resume, shard_fn=shard_fn)
    return state


if __name__ == "__main__":
    main()
