"""Compile and time detection + segmentation train steps on the real TPU.

VERDICT r2 missing #3 / weak #2: the cascade Mask R-CNN and UperNet
harnesses pass CPU tests but had never been compiled on hardware; the
batch×stage Python unrolling raises a compile-scale question. This
records, per task/resolution/batch: compile wall time and steady-state
step time (device-loop differencing — block_until_ready does not block
through the axon relay, CLAUDE.md).

Usage: python benchmarks/det_seg_tpu.py [--task det|seg|both]
       [--img 512] [--batch 2]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from fastvim_tpu.config import load_config


def _timed_compile(fn, *args):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    return compiled, time.time() - t0


def _loop_time(step_state_fn, state0, n1, n2, reps=2):
    """Difference two on-device fori_loop lengths over a carried state."""

    def make(n):
        @jax.jit
        def run(state):
            return lax.fori_loop(0, n, step_state_fn, state)

        def call():
            out = run(state0)
            # force a host sync on a scalar derived from the carry
            return float(jax.tree.leaves(out)[0].reshape(-1)[0])

        return call

    f1, f2 = make(n1), make(n2)
    t0 = time.time()
    f1()
    compile1 = time.time() - t0
    f2()

    def best(f):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            b = min(b, time.perf_counter() - t0)
        return b

    dt = (best(f2) - best(f1)) / (n2 - n1)
    return dt, compile1


def bench_detection(img, batch, max_gt=16):
    from fastvim_tpu.cli.train_detection import build_model
    from fastvim_tpu.train import TrainState, make_optimizer

    cfg = load_config("vitdet_FastVimT_coco", domain="detection",
                      overrides=[f"img_size={img}",
                                 "dtype=" + os.environ.get(
                                     "DET_DTYPE", "bf16")])
    model, depth = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, img, img, 3), jnp.float32)
    g = dict(
        gt_boxes=jnp.tile(jnp.asarray([[10., 10., 100., 100.]]),
                          (batch, max_gt, 1)),
        gt_labels=jnp.ones((batch, max_gt), jnp.int32),
        gt_masks=jnp.ones((batch, max_gt, img, img), jnp.uint8),
        gt_valid=jnp.ones((batch, max_gt), bool))
    t0 = time.time()
    # args (not closure constants) so XLA doesn't constant-fold the
    # whole init during compilation
    params = jax.jit(
        lambda r_, x_, g_: model.init({"params": r_, "sampler": r_}, x_,
                                      **g_, deterministic=True))(
        rng, x[:1], {k: v[:1] for k, v in g.items()})
    t_init = time.time() - t0
    tx = make_optimizer(lambda s: 1e-4, weight_decay=0.05, params=params)
    state = TrainState.create(params, tx)

    def body(i, st):
        r = jax.random.fold_in(rng, i)
        # regenerate inputs on-device per step: closure-constant images /
        # gt let XLA constant-fold whole assigner subgraphs (measured
        # 7-10 s folds of (B, n_anchors) argmax reductions on CPU),
        # inflating compile time and deflating step time vs the real CLI
        xi = jax.random.normal(r, x.shape, x.dtype)
        gi = dict(g)
        gi["gt_boxes"] = g["gt_boxes"] + jax.random.uniform(
            r, (batch, max_gt, 4), minval=0., maxval=4.)
        gi["gt_masks"] = (jax.random.uniform(
            r, g["gt_masks"].shape) > 0.5).astype(jnp.uint8)

        def loss_fn(p):
            losses = model.apply(
                p, xi, deterministic=False,
                rngs={"sampler": r, "dropout": r}, **gi)
            return losses["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads)

    dt, compile_s = _loop_time(body, state, 1, 3)
    return {"task": "detection", "img": img, "batch": batch,
            "init_s": round(t_init, 1),
            "compile_s": round(compile_s, 1),
            "step_ms": round(dt * 1e3, 1),
            "img_per_s": round(batch / dt, 2)}


DET_ABLATE_FLAGS = ("", "noprop", "noassign", "noroi", "noroibox",
                    "nomask", "nomasktgt", "nobbhead")


def ablate_detection(img, batch, max_gt=16, n1=1, n2=3, reps=3):
    """Head-cost attribution by subtraction: build one train-step program
    per FASTVIM_DET_ABLATE flag (read at trace time), compile all, then
    time them INTERLEAVED (the chip/relay drifts ±7% across hours —
    docs/PERF.md §6; a sequential sweep would swamp small components)."""
    from fastvim_tpu.cli.train_detection import build_model
    from fastvim_tpu.train import TrainState, make_optimizer

    rng = jax.random.PRNGKey(0)
    progs = []
    for flag in DET_ABLATE_FLAGS:
        os.environ["FASTVIM_DET_ABLATE"] = flag
        cfg = load_config("vitdet_FastVimT_coco", domain="detection",
                          overrides=[f"img_size={img}", "dtype=bf16"])
        model, _ = build_model(cfg)
        x = jax.random.normal(rng, (batch, img, img, 3), jnp.float32)
        g = dict(
            gt_boxes=jnp.tile(jnp.asarray([[10., 10., 100., 100.]]),
                              (batch, max_gt, 1)),
            gt_labels=jnp.ones((batch, max_gt), jnp.int32),
            gt_masks=jnp.ones((batch, max_gt, img, img), jnp.uint8),
            gt_valid=jnp.ones((batch, max_gt), bool))
        params = jax.jit(
            lambda r_, x_, g_: model.init(
                {"params": r_, "sampler": r_}, x_, **g_,
                deterministic=True))(rng, x[:1],
                                     {k: v[:1] for k, v in g.items()})
        tx = make_optimizer(lambda s: 1e-4, weight_decay=0.05,
                            params=params)
        state = TrainState.create(params, tx)

        def body(i, st, model=model, g=g, xshape=x.shape):
            r = jax.random.fold_in(rng, i)
            xi = jax.random.normal(r, xshape, jnp.float32)
            gi = dict(g)
            gi["gt_boxes"] = g["gt_boxes"] + jax.random.uniform(
                r, (batch, max_gt, 4), minval=0., maxval=4.)
            gi["gt_masks"] = (jax.random.uniform(
                r, g["gt_masks"].shape) > 0.5).astype(jnp.uint8)

            def loss_fn(p):
                losses = model.apply(
                    p, xi, deterministic=False,
                    rngs={"sampler": r, "dropout": r}, **gi)
                return losses["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads)

        @jax.jit
        def run(state, n, body=body):
            return lax.fori_loop(0, n, body, state)

        t0 = time.time()
        float(jax.tree.leaves(run(state, n1))[0].reshape(-1)[0])
        print(json.dumps({"flag": flag or "baseline",
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
        progs.append((flag or "baseline", run, state))
    os.environ["FASTVIM_DET_ABLATE"] = ""

    def sync(run, state, n):
        out = run(state, n)
        return float(jax.tree.leaves(out)[0].reshape(-1)[0])

    best = {name: [float("inf")] * 2 for name, _, _ in progs}
    for _ in range(reps):
        for name, run, state in progs:
            for j, n in enumerate((n1, n2)):
                t0 = time.perf_counter()
                sync(run, state, n)
                best[name][j] = min(best[name][j],
                                    time.perf_counter() - t0)
    out = {"task": "det_ablate", "img": img, "batch": batch}
    base_ms = None
    for name, _, _ in progs:
        t1, t2 = best[name]
        ms = 1e3 * (t2 - t1) / (n2 - n1)
        out[name + "_ms"] = round(ms, 1)
        if name == "baseline":
            base_ms = ms
        else:
            out[name + "_delta_ms"] = round(base_ms - ms, 1)
    return out


def bench_segmentation(img, batch):
    from fastvim_tpu.models import create_model
    from fastvim_tpu.models.upernet import UperNetSegmentor, segmentation_loss
    from fastvim_tpu.train import TrainState, make_optimizer

    cfg = load_config("upernet_FastVimT_ade20k", domain="segmentation",
                      overrides=[f"img_size={img}"])
    backbone = create_model(cfg["model"], img_size=img, num_classes=0,
                            drop_path_rate=0.0,
                            out_indices=tuple(cfg["out_indices"]))
    seg = UperNetSegmentor(backbone=backbone,
                           num_classes=cfg["num_classes"],
                           aux_index=cfg.get("aux_index", 2))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, img, img, 3), jnp.float32)
    y = jnp.zeros((batch, img, img), jnp.int32)
    params = jax.jit(lambda: seg.init(rng, x[:1], with_aux=True))()
    tx = make_optimizer(lambda s: 1e-4, weight_decay=0.01, params=params)
    state = TrainState.create(params, tx)

    def body(i, st):
        r = jax.random.fold_in(rng, i)
        xi = jax.random.normal(r, x.shape, x.dtype)
        yi = jax.random.randint(r, y.shape, 0, cfg["num_classes"])

        def loss_fn(p):
            logits, aux = seg.apply(p, xi, with_aux=True)
            return segmentation_loss(logits, yi, aux_logits=aux)

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return st.apply_gradients(grads)

    dt, compile_s = _loop_time(body, state, 1, 3)
    return {"task": "segmentation", "img": img, "batch": batch,
            "compile_s": round(compile_s, 1),
            "step_ms": round(dt * 1e3, 1),
            "img_per_s": round(batch / dt, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="both")
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()
    if args.task in ("det", "both"):
        print(json.dumps(bench_detection(args.img, args.batch)), flush=True)
    if args.task in ("seg", "both"):
        print(json.dumps(bench_segmentation(args.img, args.batch)),
              flush=True)
    if args.task == "det_ablate":
        print(json.dumps(ablate_detection(args.img, args.batch)),
              flush=True)


if __name__ == "__main__":
    main()
