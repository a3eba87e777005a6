"""Training throughput @2048 with the fused layer megakernel backward.

Compares, on real TPU, FastVim-T supervised train steps at 2048px:
  xla    — FASTVIM_LAYER_FUSED=0 (round-2 structure, XLA end-to-end)
  fused  — fused fwd + fused adjoint backward (FASTVIM_LF_BWD=fused)
  remat  — fused fwd + jax.vjp of the pure-JAX reference (=remat)

Relay-safe timing: steps loop on device in a fori_loop (state carries the
dependency), two loop lengths differenced (see bench.py).

  python benchmarks/train_fused_tpu.py --modes xla,fused --batches 2,3
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


def run_mode(mode, batch, img, n1, n2):
    os.environ["FASTVIM_LAYER_FUSED"] = "0" if mode == "xla" else "1"
    os.environ["FASTVIM_LF_BWD"] = "remat" if mode == "remat" else "fused"

    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_train_step,
    )

    model = create_model("fastvim_tiny", img_size=img, dtype=jnp.bfloat16,
                         drop_path_rate=0.0)
    num_classes = 1000
    kproj = jax.random.normal(jax.random.PRNGKey(9), (3, num_classes))

    def make_batch(key):
        imgs = jax.random.normal(key, (batch, img, img, 3), jnp.bfloat16)
        labels = jnp.argmax(imgs.astype(jnp.float32).mean((1, 2)) @ kproj,
                            axis=-1)
        return imgs, labels

    x0, y0 = make_batch(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(2), x0)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 1000, 20),
                        weight_decay=0.05, params=params)
    state = TrainState.create(params, tx)
    step_fn = make_supervised_train_step(model, num_classes,
                                         label_smoothing=0.1,
                                         ema_decay=None)

    @jax.jit
    def run_n(state, key, n):
        def body(i, carry):
            state, loss = carry
            k = jax.random.fold_in(key, i)
            imgs, labels = make_batch(k)
            state, m = step_fn(state, {"image": imgs, "label": labels}, k)
            return state, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    t0 = time.perf_counter()
    _, l1 = run_n(state, jax.random.PRNGKey(3), n1)
    l1 = float(l1)
    compile_s = time.perf_counter() - t0

    def timed(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _, l = run_n(state, jax.random.PRNGKey(4), n)
            float(l)
            best = min(best, time.perf_counter() - t0)
        return best

    d = timed(n2) - timed(n1)
    step_ms = d / (n2 - n1) * 1e3
    return dict(mode=mode, batch=batch, step_ms=round(step_ms, 1),
                img_per_s=round(batch / (step_ms / 1e3), 1),
                compile_s=round(compile_s, 1), loss=round(l1, 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=2048)
    p.add_argument("--modes", default="xla,fused,remat")
    p.add_argument("--batches", default="2")
    p.add_argument("--n1", type=int, default=3)
    p.add_argument("--n2", type=int, default=13)
    args = p.parse_args()

    for mode in args.modes.split(","):
        for b in map(int, args.batches.split(",")):
            r = run_mode(mode, b, args.img, args.n1, args.n2)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
