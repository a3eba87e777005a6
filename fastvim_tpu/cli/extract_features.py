"""Feature-extractor entry point for segmentation/detection backbones.

The reference wires MM_FastVim into mmseg/mmdet runners
(`segmentation/tools/train.py`, `detection/tools/train.py`); here the
equivalent backbone contract is exposed directly — load a (EMA-first)
checkpoint, resize the pos-embed to the task grid, and emit multi-scale
NHWC feature maps (+ optional SimpleFPN pyramid for detection):

  python -m fastvim_tpu.cli.extract_features \
      --config_name upernet_FastVimT_ade20k --images img1.png img2.png
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from fastvim_tpu.config import load_config


def build_backbone(cfg, checkpoint=None):
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train.checkpoint import load_pretrained_backbone

    model = create_model(
        cfg["model"], img_size=cfg["img_size"], num_classes=0,
        drop_path_rate=0.0, out_indices=tuple(cfg["out_indices"]),
        layer_fused=cfg.get("layer_fused", "auto"))
    x0 = jnp.zeros((1, cfg["img_size"], cfg["img_size"], 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    ckpt = checkpoint or cfg.get("pretrained_checkpoint_path")
    if ckpt:
        g = cfg["img_size"] // cfg["patch_size"]
        params = load_pretrained_backbone(
            ckpt, params, prefer_ema=cfg.get("load_ema", True),
            new_grid=(g, g), old_grid=(224 // cfg["patch_size"],) * 2)
    return model, params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_name", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--images", nargs="*", default=None)
    p.add_argument("--with_fpn", action="store_true",
                   help="apply the SimpleFPN neck (detection)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config_name, overrides=args.overrides)

    model, params = build_backbone(cfg, args.checkpoint)
    size = cfg["img_size"]
    if args.images:
        from PIL import Image

        from fastvim_tpu.data.transforms import eval_transform

        arrs = [eval_transform(Image.open(f), size) for f in args.images]
        x = jnp.asarray(np.stack(arrs))
    else:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, size, size, 3))
    feats = model.apply(params, x)
    print("feature maps:", [tuple(f.shape) for f in feats])
    if args.with_fpn:
        from fastvim_tpu.models.heads import SimpleFPN

        neck_cfg = cfg.get("neck", {})
        fpn = SimpleFPN(backbone_channel=model.embed_dim,
                        out_channels=neck_cfg.get("out_channels", 256),
                        num_outs=neck_cfg.get("num_outs", 5))
        fpn_params = fpn.init(jax.random.PRNGKey(2), feats[-1])
        pyramid = fpn.apply(fpn_params, feats[-1])
        print("fpn pyramid:", [tuple(f.shape) for f in pyramid])
    return feats


if __name__ == "__main__":
    main()
