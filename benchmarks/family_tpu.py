"""Task-family throughput on the real chip — the families bench.py's
headline numbers don't cover: MAE pretraining (masked scatter-pool
path), ChannelVim (HCS cell imaging), and — via
benchmark_generation.py — LM decode.

Timing: on-device fori_loop differencing (see bench.py; the relay does
not block on block_until_ready).

Gotchas learned here:
- state/params MUST be jit arguments, not closure constants — closure
  arrays get serialized into the remote-compile request body and a
  base-size optimizer state blows the relay's HTTP 413 size limit.
- channel_ids is per-batch 1-D (C,) — the HCS sampler picks one
  channel subset per batch (cli/train_cells.py:118-124).
- MAE pretrain memory is decoder-dominated: the masked path keeps
  full-L fp32 scan intermediates (B, L, n, d_inner); b64 base OOMs a
  16 GB v5e; b32 still needs 19.4 G. Default b16.

  python benchmarks/family_tpu.py [--which mae,channel]
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


def _timed(run_n, state, n1, n2, batch):
    float(run_n(state, n1)[1])  # compile (n is a traced arg — one program)

    def best(n):
        b = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run_n(state, n)[1])
            b = min(b, time.perf_counter() - t0)
        return b

    dt = (best(n2) - best(n1)) / (n2 - n1)
    return {"step_ms": round(1e3 * dt, 2),
            "img_per_s": round(batch / dt, 1)}


def bench_mae(model_name, img, batch, n1=2, n2=8, remat=False):
    """MAE pretrain step (masked path — FASTVIM_LAYER_FUSED
    self-disables; this is the scatter-pool mixer's train cost)."""
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_mae_train_step, make_optimizer)

    model = create_model(model_name, img_size=img, dtype=jnp.bfloat16,
                         remat=remat)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3),
                           jnp.bfloat16)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(2)},
        x0, mask_ratio=0.75)
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

    return _timed(run_n, state, n1, n2, batch)


def bench_channel(model_name, img, batch, chans=8, n1=2, n2=8):
    """ChannelVim supervised train step + forward (HCS, all channels)."""
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_optimizer,
                                   make_supervised_train_step)

    model = create_model(model_name, img_size=img, num_classes=161,
                         dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (batch, img, img, chans), jnp.bfloat16)
    cid = jnp.arange(chans, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, channel_ids=cid)
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

    train = _timed(run_n, state, n1, n2, batch)

    @jax.jit
    def fwd_n(params, n):
        def body(i, s):
            out = model.apply(params, x0 + s, channel_ids=cid)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30

        return params, lax.fori_loop(0, n, body, jnp.float32(0.0))

    fwd = _timed(fwd_n, params, 4, 12, batch)
    return {"train": train, "fwd": fwd}


def bench_mae_remat(model_name, img):
    """Remat A/B for MAE pretraining: the masked path keeps full-L fp32
    scan intermediates for backward (b32 base = 19.4 GB → OOM on a
    16 GB v5e). nn.remat over encoder blocks trades recompute FLOPs for
    that memory — measure whether the bigger batch it unlocks nets out.
    Interleaved per docs/PERF.md §6 (chip drifts ±7% across hours)."""
    cases = [("b16", 16, False), ("b16_remat", 16, True),
             ("b32_remat", 32, True)]
    # ONE shared TrainState for every case: the state (params + Adam
    # moments, ~1.8 GB fp32 for MAE-base) is batch-independent and
    # remat does not change the param tree — three per-case states
    # plus the b32 step's 4.2 GB temp OOM'd a 16 GB v5e on the first
    # two attempts (once via leaked failed-compile state, once via
    # 3x resident states in the interleaved loop).
    state = _make_mae_state(model_name, img)
    progs = {}
    for name, b, rm in cases:
        try:
            progs[name] = (b, _compile_mae(model_name, img, b, rm,
                                           state))
        except Exception as e:  # OOM etc — record, release, move on
            print(json.dumps({"case": name,
                              "error": str(e)[:200]}), flush=True)
            import gc
            gc.collect()
    out = {}
    best = {k: [float("inf")] * 2 for k in progs}
    for _ in range(3):
        for name, (b, run_n) in progs.items():
            for j, n in enumerate((2, 8)):
                t0 = time.perf_counter()
                float(run_n(state, n)[1])
                best[name][j] = min(best[name][j],
                                    time.perf_counter() - t0)
    for name, (b, _) in progs.items():
        dt = (best[name][1] - best[name][0]) / 6
        out[name] = {"batch": b, "step_ms": round(1e3 * dt, 2),
                     "img_per_s": round(b / dt, 1)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def _make_mae_state(model_name, img):
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_mae_train_step, make_optimizer)

    model = create_model(model_name, img_size=img, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, img, img, 3), jnp.bfloat16)
    params = jax.jit(functools.partial(
        model.init, mask_ratio=0.75))(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(2)},
        x0)
    tx = make_optimizer(cosine_with_warmup(1.5e-4, 0.0, 100, 10),
                        weight_decay=0.05, params=params,
                        betas=(0.9, 0.95))
    return TrainState.create(params, tx)


def _compile_mae(model_name, img, batch, remat, state):
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import make_mae_train_step

    model = create_model(model_name, img_size=img, dtype=jnp.bfloat16,
                         remat=remat)
    shape = (batch, img, img, 3)
    step_fn = make_mae_train_step(model, mask_ratio=0.75)

    @jax.jit
    def run_n(state, n):
        def body(i, carry):
            st, _ = carry
            k = jax.random.fold_in(jax.random.PRNGKey(3), i)
            imgs = jax.random.normal(k, shape, jnp.bfloat16)
            st, m = step_fn(st, {"image": imgs}, k)
            return st, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    float(run_n(state, 1)[1])  # compile
    return run_n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="mae,channel")
    p.add_argument("--mae_model", default="mae_FastVim_base_dec512d2b")
    p.add_argument("--mae_batch", type=int, default=16)
    p.add_argument("--channel_model", default="fastchannelvim_small_ps16")
    p.add_argument("--channel_batch", type=int, default=8)
    p.add_argument("--img", type=int, default=224)
    args = p.parse_args()

    out = {}
    if "mae_remat" in args.which:
        out["mae_remat"] = bench_mae_remat(args.mae_model, args.img)
        args.which = args.which.replace("mae_remat", "")
    if "mae" in args.which:
        out["mae_pretrain"] = {
            "model": args.mae_model, "batch": args.mae_batch,
            **bench_mae(args.mae_model, args.img, args.mae_batch)}
        print(json.dumps(out["mae_pretrain"]), flush=True)
    if "channel" in args.which:
        out["channelvim"] = {
            "model": args.channel_model, "batch": args.channel_batch,
            **bench_channel(args.channel_model, args.img,
                            args.channel_batch)}
        print(json.dumps(out["channelvim"]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
