"""A/B: exact-NMS formulations on the detection EVAL path, real TPU.

VERDICT r3 weak #4 tail: the eval path keeps reference-exact greedy NMS,
previously implemented as a max_out-deep sequential argmax scan (512
dependent rounds in RPN proposal generation + max_per_img rounds in the
final per-class NMS) — never measured at eval scale. ops/boxes.nms is
now an exact suppression FIXPOINT (few (n,n) vectorized rounds, parity-
locked vs the scan in tests/test_boxes.py); this harness measures the
end-to-end predict step both ways, interleaved (the chip/relay drifts
±7% across hours — docs/PERF.md §6), plus a standalone NMS microbench
at RPN scale.

Usage: python benchmarks/nms_tpu.py [--img 512] [--batch 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from fastvim_tpu.config import load_config


def _mk_predict_prog(img, batch, impl):
    """Build the eval (predict) step with ops-level NMS impl selected at
    trace time by rebinding the name detection.py imported."""
    import fastvim_tpu.models.detection as det
    from fastvim_tpu.cli.train_detection import build_model
    from fastvim_tpu.ops import boxes as ob

    det.nms = ob.nms if impl == "fixpoint" else ob.nms_scan
    cfg = load_config("vitdet_FastVimT_coco", domain="detection",
                      overrides=[f"img_size={img}", "dtype=bf16"])
    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(rng, (1, img, img, 3), jnp.float32)
    params = jax.jit(lambda r_, x_: model.init(
        {"params": r_, "sampler": r_}, x_, deterministic=True))(rng, x1)

    def body(i, s):
        xi = jax.random.normal(jax.random.fold_in(rng, i),
                               (batch, img, img, 3), jnp.float32) + s
        out = model.apply(params, xi)
        return jnp.sum(out["scores"].astype(jnp.float32)) * 1e-30

    def make(n):
        @jax.jit
        def run(s):
            return lax.fori_loop(0, n, body, s)

        return lambda: float(run(jnp.float32(0.0)))

    return make


def _mk_nms_micro(n_boxes, max_out, impl, reps_in_loop=4):
    from fastvim_tpu.ops import boxes as ob

    fn = ob.nms if impl == "fixpoint" else ob.nms_scan
    rng = jax.random.PRNGKey(1)
    xy = jax.random.uniform(rng, (n_boxes, 2), minval=0., maxval=500.)
    wh = jax.random.uniform(jax.random.fold_in(rng, 1), (n_boxes, 2),
                            minval=20., maxval=120.)
    boxes0 = jnp.concatenate([xy, xy + wh], 1)
    scores0 = jax.random.uniform(jax.random.fold_in(rng, 2), (n_boxes,))

    def body(i, s):
        # data-dependent jitter so iterations can't be deduped
        b = boxes0 + s
        idx, valid = fn(b, scores0, 0.7, max_out)
        return jnp.sum(jnp.where(valid, idx, 0)).astype(jnp.float32) * 1e-9

    def make(n):
        @jax.jit
        def run(s):
            return lax.fori_loop(0, n, body, s)

        return lambda: float(run(jnp.float32(0.0)))

    return make


def _interleaved(progs, n1, n2, brackets=4):
    """progs: {name: make(n)->callable}. Compile all, then time
    interleaved best-of across brackets."""
    fns = {}
    for name, make in progs.items():
        t0 = time.time()
        f1, f2 = make(n1), make(n2)
        f1(), f2()
        print(f"  compiled {name} in {time.time() - t0:.0f}s",
              flush=True)
        fns[name] = (f1, f2)
    best = {name: [float("inf"), float("inf")] for name in fns}
    for _ in range(brackets):
        for name, (f1, f2) in fns.items():
            t0 = time.perf_counter()
            f1()
            best[name][0] = min(best[name][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            f2()
            best[name][1] = min(best[name][1], time.perf_counter() - t0)
    return {name: (b2 - b1) / (n2 - n1) for name, (b1, b2) in
            best.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--micro_only", action="store_true")
    args = ap.parse_args()

    print("== standalone NMS, RPN scale (n=3000, max_out=512) ==",
          flush=True)
    micro = _interleaved(
        {impl: _mk_nms_micro(3000, 512, impl)
         for impl in ("fixpoint", "scan")}, 2, 6)
    for k, v in micro.items():
        print(f"  {k}: {v * 1e3:.2f} ms/call")

    if args.micro_only:
        return
    print(f"== detection predict step @{args.img} b{args.batch} ==",
          flush=True)
    step = _interleaved(
        {impl: _mk_predict_prog(args.img, args.batch, impl)
         for impl in ("fixpoint", "scan")}, 1, 3, brackets=3)
    for k, v in step.items():
        print(f"  {k}: {v * 1e3:.1f} ms/step "
              f"({args.batch / v:.2f} img/s)")


if __name__ == "__main__":
    main()
