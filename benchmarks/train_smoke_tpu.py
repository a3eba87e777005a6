"""Real-hardware training smoke: FastVim-T supervised steps on one TPU.

Runs a jitted train step (mixup + EMA + AdamW) on-device in a fori_loop
(relay-safe timing, see bench.py) on a learnable synthetic task, reports
steps/sec + images/sec and verifies the loss decreases.

  python benchmarks/train_smoke_tpu.py [--img 224] [--batch 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_train_step,
    )

    model = create_model("fastvim_tiny", img_size=args.img,
                         dtype=jnp.bfloat16)
    num_classes = 1000
    rng = jax.random.PRNGKey(0)
    # learnable synthetic task: label = argmax over 8 fixed projections of
    # the mean color (noise on top) — loss should fall fast
    kproj = jax.random.normal(jax.random.PRNGKey(9), (3, num_classes))

    def make_batch(key):
        imgs = jax.random.normal(key, (args.batch, args.img, args.img, 3),
                                 jnp.bfloat16)
        labels = jnp.argmax(imgs.astype(jnp.float32).mean((1, 2)) @ kproj,
                            axis=-1)
        return imgs, labels

    x0, y0 = make_batch(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(2), x0)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 1000, 20),
                        weight_decay=0.05, params=params)
    state = TrainState.create(params, tx, ema=True)
    step_fn = make_supervised_train_step(
        model, num_classes,
        mixup_config=dict(mixup_alpha=0.8, cutmix_alpha=1.0),
        label_smoothing=0.1, ema_decay=0.9999)

    @jax.jit
    def run_n(state, key, n):
        def body(i, carry):
            state, loss = carry
            k = jax.random.fold_in(key, i)
            imgs, labels = make_batch(k)
            state, m = step_fn(state, {"image": imgs, "label": labels}, k)
            return state, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    # warm compile + first losses
    state, first_loss = run_n(state, jax.random.PRNGKey(3), 2)
    first = float(first_loss)
    t0 = time.perf_counter()
    state, last_loss = run_n(state, jax.random.PRNGKey(4), args.steps)
    last = float(last_loss)  # forces completion through the relay
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "fastvim_tiny_train_images_per_sec",
        "value": round(args.batch * args.steps / dt, 2),
        "unit": "images/sec",
        "steps_per_sec": round(args.steps / dt, 3),
        "img": args.img, "batch": args.batch,
        "loss_first": round(first, 4), "loss_last": round(last, 4),
        "loss_decreased": bool(last < first),
    }))


if __name__ == "__main__":
    main()
