"""Where does the ChannelVim (cells family) step spend time?

family_tpu.py measured ChannelVim-small ps16 HCS @224 C=8: train 32.5
img/s, fwd 95.8 — a ~3x bwd/fwd ratio and far below the dense model.
Unlike the dense 2-D path, 3-D channel grids still MATERIALIZE two
full-sequence rotations per odd block (models/blocks.py rotate_grid;
the flip-free transposed conv covers 2-D grids only) and take the
generic XLA mixer path (no megakernel: len(grid)==3).

Subtraction probes (numerics change; speed is the signal):
  fwd:   full / norotate (rotate_every_block=False) / noconv / noscan
  train: full / norotate

Usage: python benchmarks/channel_cost_tpu.py [--batch 8] [--chans 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from family_tpu import _timed  # noqa: E402


def build(model_name, img, batch, chans, rotate):
    from fastvim_tpu.models import create_model
    model = create_model(model_name, img_size=img, num_classes=161,
                         dtype=jnp.bfloat16,
                         rotate_every_block=rotate)
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (batch, img, img, chans), jnp.bfloat16)
    cid = jnp.arange(chans, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, channel_ids=cid)
    return model, params, x0, cid


def bench_fwd(model_name, img, batch, chans, rotate=True):
    model, params, x0, cid = build(model_name, img, batch, chans, rotate)

    @jax.jit
    def fwd_n(params, n):
        def body(i, s):
            out = model.apply(params, x0 + s, channel_ids=cid)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30

        return params, lax.fori_loop(0, n, body, jnp.float32(0.0))

    return _timed(fwd_n, params, 4, 12, batch)


def bench_train(model_name, img, batch, chans, rotate=True):
    from fastvim_tpu.train import (TrainState, cosine_with_warmup,
                                   make_optimizer,
                                   make_supervised_train_step)
    model, params, x0, cid = build(model_name, img, batch, chans, rotate)
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

    return _timed(run_n, state, 2, 8, batch)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fastchannelvim_small_ps16")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chans", type=int, default=8)
    p.add_argument("--which", default="fwd,train")
    args = p.parse_args()

    out = {"model": args.model, "batch": args.batch, "chans": args.chans}
    if "fwd" in args.which:
        # flipfree: the Channel-First odd-layer conv in rotated-raster
        # order without materializing the rotation — MEASURED NEGATIVE
        # (87.8 vs 83.1 ms interleaved), default off; the probe stays
        # for re-measurement on future compilers.
        for name, rot, abl, ff in [("fwd_full", True, "full", "0"),
                                   ("fwd_flipfree", True, "full", "1"),
                                   ("fwd_norotate", False, "full", "0"),
                                   ("fwd_noconv", True, "noconv", "0"),
                                   ("fwd_noscan", True, "noscan", "0")]:
            os.environ["FASTVIM_COMPONENT_ABLATE"] = abl
            os.environ["FASTVIM_CHANNEL_FLIPFREE"] = ff
            try:
                out[name] = bench_fwd(args.model, args.img, args.batch,
                                      args.chans, rotate=rot)
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": str(e)[:160]}
            print(json.dumps({name: out[name]}), flush=True)
        os.environ.pop("FASTVIM_COMPONENT_ABLATE", None)
    if "train" in args.which:
        for name, rot, ff in [("train_full", True, "0"),
                              ("train_flipfree", True, "1"),
                              ("train_norotate", False, "0")]:
            os.environ["FASTVIM_CHANNEL_FLIPFREE"] = ff
            try:
                out[name] = bench_train(args.model, args.img, args.batch,
                                        args.chans, rotate=rot)
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": str(e)[:160]}
            print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
