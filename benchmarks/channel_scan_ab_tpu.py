"""Pooled-scan impl A/B for the ChannelVim family (assoc vs Pallas).

channel_cost_tpu.py's fwd_noscan probe showed scans + their projections
are ~72 of 83 ms @224 ps16 C=8 b8. The pooled scans (L=112,
d_inner=768, n=16) run as XLA assoc doubling scans: ~log2(L) full-carry
sweeps over (B, 112, 16, 768) fp32 temps per direction per layer, fully
EXPOSED — unlike the dense model @2048 (where routing pooled L=128
scans to Pallas regressed 86.3→69.8 because they overlapped the large
full-length elementwise streams), the channel model's full-L stream
(B·1568·768) is SMALLER than one scan temp (B·112·16·768), so there is
nothing to hide the sweeps behind. The Pallas chunked scan reads and
writes each operand once.

Interleaved brackets in one process per the measurement rule
(docs/PERF.md §6: the chip/relay drifts ±7% across hours).

Usage: python benchmarks/channel_scan_ab_tpu.py [--batch 8] [--chans 8]
       [--min_l 64] [--which fwd,train]
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

from channel_cost_tpu import build  # noqa: E402


def _interleaved(pairs, n1, n2, batch, reps=3):
    """pairs: {name: (run_n, state)}. Compile all, then time in
    interleaved brackets; per-variant best-of-reps differenced."""
    for run_n, state in pairs.values():
        float(run_n(state, n1)[1])
    best = {k: {n1: float("inf"), n2: float("inf")} for k in pairs}
    for _ in range(reps):
        for k, (run_n, state) in pairs.items():
            for n in (n1, n2):
                t0 = time.perf_counter()
                float(run_n(state, n)[1])
                best[k][n] = min(best[k][n], time.perf_counter() - t0)
    out = {}
    for k in pairs:
        dt = (best[k][n2] - best[k][n1]) / (n2 - n1)
        out[k] = {"step_ms": round(1e3 * dt, 2),
                  "img_per_s": round(batch / dt, 1)}
    return out


def make_fwd(model_name, img, batch, chans):
    model, params, x0, cid = build(model_name, img, batch, chans, True)

    @jax.jit
    def fwd_n(params, n):
        def body(i, s):
            out = model.apply(params, x0 + s, channel_ids=cid)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30

        return params, lax.fori_loop(0, n, body, jnp.float32(0.0))

    # trace NOW, while the caller's FASTVIM_PALLAS_MIN_L setting is live
    # (the scan dispatch reads it at trace time; jit traces lazily)
    float(fwd_n(params, 1)[1])
    return fwd_n, params


def make_train(model_name, img, batch, chans):
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_optimizer,
                                   make_supervised_train_step)
    model, params, x0, cid = build(model_name, img, batch, chans, True)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 100, 10),
                        weight_decay=0.05, params=params)
    state = TrainState.create(params, tx)
    step_fn = make_supervised_train_step(model, 161, ema_decay=None,
                                         channel_model=True)

    @jax.jit
    def run_n(state, n):
        def body(i, carry):
            st, _ = carry
            k = jax.random.fold_in(jax.random.PRNGKey(3), i)
            imgs = jax.random.normal(k, x0.shape, x0.dtype)
            batch_d = {"image": imgs,
                       "label": jnp.zeros((batch,), jnp.int32),
                       "channel_ids": cid}
            st, m = step_fn(st, batch_d, k)
            return st, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    float(run_n(state, 1)[1])  # trace under the caller's env setting
    return run_n, state


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fastchannelvim_small_ps16")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chans", type=int, default=8)
    p.add_argument("--min_l", type=int, default=64)
    p.add_argument("--which", default="fwd,train")
    args = p.parse_args()

    out = {"model": args.model, "batch": args.batch, "chans": args.chans}
    if "fwd" in args.which:
        pairs = {}
        os.environ.pop("FASTVIM_PALLAS_MIN_L", None)  # assoc (default)
        pairs["fwd_assoc"] = make_fwd(args.model, args.img, args.batch,
                                      args.chans)
        os.environ["FASTVIM_PALLAS_MIN_L"] = str(args.min_l)
        pairs["fwd_pallas"] = make_fwd(args.model, args.img, args.batch,
                                       args.chans)
        os.environ.pop("FASTVIM_PALLAS_MIN_L", None)
        out.update(_interleaved(pairs, 4, 12, args.batch))
        print(json.dumps({k: out[k] for k in pairs}), flush=True)
    if "train" in args.which:
        pairs = {}
        os.environ.pop("FASTVIM_PALLAS_MIN_L", None)
        pairs["train_assoc"] = make_train(args.model, args.img,
                                          args.batch, args.chans)
        os.environ["FASTVIM_PALLAS_MIN_L"] = str(args.min_l)
        pairs["train_pallas"] = make_train(args.model, args.img,
                                           args.batch, args.chans)
        os.environ.pop("FASTVIM_PALLAS_MIN_L", None)
        out.update(_interleaved(pairs, 2, 8, args.batch))
        print(json.dumps({k: out[k] for k in pairs
                          if k.startswith("train")}), flush=True)
    print(json.dumps(out))
