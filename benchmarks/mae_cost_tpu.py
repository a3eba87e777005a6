"""MAE-family component ledger + scan-routing A/B (VERDICT r3 #1).

The ChannelVim lesson applied to MAE-Base pretraining: the DECODER runs
full-length non-pooled scans (L=grid²=196, d_inner=2·512=1024, n=16) —
the exposure pattern where the XLA assoc doubling scan's full-carry
fp32 temps (B·196·16·1024·4B ≈ 12.8 MB/img per sweep) dwarf the full-L
activation stream AND dominate backward memory (the known b32 OOM,
family_tpu.py:15-18). The masked ENCODER pools rows to L=14 bins
(below any Pallas threshold) but pays full-length one-hot scatter /
gather einsums (mixer.py:330,346).

Probes:
  ledger  — fwd subtraction: full / noscan / noconv / noonehot
            (FASTVIM_COMPONENT_ABLATE; numerics change, speed is the
            signal)
  ab      — interleaved A/B (docs/PERF.md §6 measurement rule):
            pallas_min_l=None (assoc, the r3 shipped path) vs 64
            (decoder scans → Pallas chunked kernel), fwd + train
  fit     — b32 WITHOUT remat under Pallas routing (the chunked bwd's
            temps are O(L·(n+d)), not O(L·n·d) — should kill the OOM)
  parity  — hardware logits/loss rel-err pallas vs assoc routing

Usage: python benchmarks/mae_cost_tpu.py [--which ledger,ab,fit,parity]
       [--model mae_FastVim_base_dec512d2b] [--batch 16]
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

from family_tpu import _timed  # noqa: E402


def build(model_name, img, batch, pallas_min_l, remat=False):
    from fastvim_tpu.models import create_model

    model = create_model(model_name, img_size=img, dtype=jnp.bfloat16,
                         pallas_min_l=pallas_min_l, remat=remat)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3),
                           jnp.bfloat16)
    params = jax.jit(functools.partial(model.init, mask_ratio=0.75))(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(2)},
        x0)
    return model, params, x0


def make_fwd(model_name, img, batch, pallas_min_l):
    model, params, x0 = build(model_name, img, batch, pallas_min_l)

    @jax.jit
    def fwd_n(params, n):
        def body(i, s):
            k = jax.random.fold_in(jax.random.PRNGKey(3), i)
            loss, _, _ = model.apply(params, x0 + s, mask_ratio=0.75,
                                     rngs={"mask": k})
            return loss.astype(jnp.float32) * 1e-30

        return params, lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(fwd_n(params, 1)[1])  # trace under the caller's env setting
    return fwd_n, params


def make_train(model_name, img, batch, pallas_min_l, remat=False):
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_mae_train_step, make_optimizer)

    model, params, x0 = build(model_name, img, batch, pallas_min_l,
                              remat)
    tx = make_optimizer(cosine_with_warmup(1.5e-4, 0.0, 100, 10),
                        weight_decay=0.05, params=params,
                        betas=(0.9, 0.95))
    state = TrainState.create(params, tx)
    step_fn = make_mae_train_step(model, mask_ratio=0.75)

    @jax.jit
    def run_n(state, n):
        def body(i, carry):
            st, _ = carry
            k = jax.random.fold_in(jax.random.PRNGKey(3), i)
            imgs = jax.random.normal(k, x0.shape, x0.dtype)
            st, m = step_fn(st, {"image": imgs}, k)
            return st, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    float(run_n(state, 1)[1])
    return run_n, state


def _interleaved(pairs, n1, n2, batch, reps=3):
    """pairs: {name: (run_n, state)} — all already compiled. Time in
    interleaved brackets, per-variant best-of-reps differenced."""
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


def run_ledger(args):
    out = {}
    for name, abl in [("fwd_full", "full"), ("fwd_noscan", "noscan"),
                      ("fwd_noconv", "noconv"),
                      ("fwd_noonehot", "noonehot")]:
        os.environ["FASTVIM_COMPONENT_ABLATE"] = abl
        try:
            fwd_n, params = make_fwd(args.model, args.img, args.batch,
                                     None)
            out[name] = _timed(fwd_n, params, 4, 12, args.batch)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:160]}
        print(json.dumps({name: out[name]}), flush=True)
    os.environ.pop("FASTVIM_COMPONENT_ABLATE", None)
    return out


def run_ab(args):
    out = {}
    pairs = {}
    pairs["fwd_assoc"] = make_fwd(args.model, args.img, args.batch, None)
    pairs["fwd_pallas"] = make_fwd(args.model, args.img, args.batch,
                                   args.min_l)
    out.update(_interleaved(pairs, 4, 12, args.batch))
    print(json.dumps({k: out[k] for k in pairs}), flush=True)

    pairs = {}
    pairs["train_assoc"] = make_train(args.model, args.img, args.batch,
                                      None)
    pairs["train_pallas"] = make_train(args.model, args.img, args.batch,
                                       args.min_l)
    out.update(_interleaved(pairs, 2, 8, args.batch))
    print(json.dumps({k: out[k] for k in pairs}), flush=True)
    return out


def run_fit(args):
    """b32, NO remat, Pallas routing — does the chunk-recompute backward
    kill the assoc-temp OOM (r3: b32 needed remat, 60.2 img/s)?"""
    out = {}
    for name, b, min_l in [("b32_pallas", 32, args.min_l),
                           ("b48_pallas", 48, args.min_l)]:
        try:
            run_n, state = make_train(args.model, args.img, b, min_l)
            out[name] = {"batch": b, **_timed(run_n, state, 2, 8, b)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"batch": b, "error": str(e)[:200]}
        print(json.dumps({name: out[name]}), flush=True)
        import gc

        gc.collect()
    return out


def run_parity(args):
    """Hardware loss parity: pallas vs assoc routing, same mask rng."""
    model_a, params, x0 = build(args.model, args.img, 4, None)
    model_p, _, _ = build(args.model, args.img, 4, args.min_l)

    @jax.jit
    def loss_fn_a(params, x):
        return model_a.apply(params, x, mask_ratio=0.75,
                             rngs={"mask": jax.random.PRNGKey(7)})[0]

    @jax.jit
    def loss_fn_p(params, x):
        return model_p.apply(params, x, mask_ratio=0.75,
                             rngs={"mask": jax.random.PRNGKey(7)})[0]

    la = float(loss_fn_a(params, x0))
    lp = float(loss_fn_p(params, x0))
    rel = abs(la - lp) / max(abs(la), 1e-9)
    out = {"loss_assoc": la, "loss_pallas": lp, "rel_err": rel}
    print(json.dumps({"parity": out}), flush=True)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mae_FastVim_base_dec512d2b")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--min_l", type=int, default=64)
    p.add_argument("--which", default="ledger,ab,parity")
    args = p.parse_args()

    out = {"model": args.model, "batch": args.batch}
    if "ledger" in args.which:
        out["ledger"] = run_ledger(args)
    if "ab" in args.which:
        out["ab"] = run_ab(args)
    if "fit" in args.which:
        out["fit"] = run_fit(args)
    if "parity" in args.which:
        out["parity"] = run_parity(args)
    print(json.dumps(out))
