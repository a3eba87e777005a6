"""Evaluate a classification checkpoint (mirrors
imagenet_classification/test.py):
  python -m fastvim_tpu.cli.test_classification --config_name FastVimT \
      --checkpoint out/ckpt/step_N [--ema]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fastvim_tpu.cli.common import base_parser, load_cli_config, setup_mesh


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA weights (reference loads EMA "
                        "first, models/fastvim.py:605-612)")
    args = p.parse_args(argv)
    cfg = load_cli_config(args, "classification")

    from fastvim_tpu.data import create_imagenet_loader
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import make_supervised_eval_step
    from fastvim_tpu.train.checkpoint import restore_checkpoint

    mesh, shard_fn = setup_mesh()
    model = create_model(cfg["model"], img_size=cfg["img_size"],
                         num_classes=cfg["num_classes"], drop_path_rate=0.0,
                         layer_fused=cfg.get("layer_fused", "auto"))
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"], 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    if args.checkpoint:
        restored = restore_checkpoint(args.checkpoint)
        key = "ema_params" if args.ema and "ema_params" in restored else \
            "params"
        params = restored[key]

    loader = create_imagenet_loader(
        cfg["data"].get("dir"), "val", cfg["batch_size"], cfg["img_size"],
        training=False, synthetic_samples=args.synthetic_samples)
    eval_step = make_supervised_eval_step(model)
    losses, accs = [], []
    for batch in loader:
        m = eval_step(params, shard_fn(batch))
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
    print({"test_loss": float(np.mean(losses)),
           "test_acc": float(np.mean(accs))})


if __name__ == "__main__":
    main()
