"""Detection train-step HLO size + CPU compile time (VERDICT r3 #6).

Round-3 baseline (STATUS.md): ~57.5k compiled-HLO lines at 512px (flat
in batch), ~6 min remote TPU compile. The scan-over-stages restructure
(models/detection.py::_CascadeStageTrain) should cut the stage-body
triplication. Run on CPU (counts are platform-comparable; the r3 number
was also counted on CPU).

Usage: python benchmarks/det_hlo.py [--img 512] [--batch 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=512)
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()

    from fastvim_tpu.models import VisionMamba
    from fastvim_tpu.models.detection import CascadeMaskRCNN

    backbone = VisionMamba(
        img_size=args.img, patch_size=16, depth=24, embed_dim=192,
        num_classes=0, out_indices=(23,), drop_path_rate=0.0,
        rms_norm=True, residual_in_fp32=True, fused_add_norm=True,
        final_pool_type="mean", if_abs_pos_embed=True,
        collapse_method="mean", layer_fused="off")
    model = CascadeMaskRCNN(backbone=backbone, num_classes=80,
                            backbone_channel=192, img_size=args.img)

    B, G = args.batch, 8
    imgs = jnp.zeros((B, args.img, args.img, 3), jnp.float32)
    gt = dict(gt_boxes=jnp.zeros((B, G, 4)), gt_labels=jnp.zeros(
        (B, G), jnp.int32), gt_masks=jnp.zeros((B, G, args.img, args.img),
                                               jnp.uint8),
              gt_valid=jnp.zeros((B, G), bool))
    t0 = time.time()
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "sampler": jax.random.PRNGKey(1)},
                           imgs, **gt))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    init_s = time.time() - t0

    def loss_fn(p, imgs, gt):
        return model.apply(p, imgs, rngs={"sampler": jax.random.PRNGKey(
            2)}, **gt)["loss"]

    step = jax.jit(jax.grad(loss_fn))
    t0 = time.time()
    lowered = step.lower(params, imgs, gt)
    trace_s = time.time() - t0
    n_lowered = lowered.as_text().count("\n")
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    n_compiled = compiled.as_text().count("\n")
    print(json.dumps({
        "img": args.img, "batch": args.batch, "init_s": round(init_s, 1),
        "trace_s": round(trace_s, 1), "cpu_compile_s": round(compile_s, 1),
        "hlo_lines_lowered": n_lowered,
        "hlo_lines_compiled": n_compiled}))


if __name__ == "__main__":
    main()
