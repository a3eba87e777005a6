"""Sustained-vs-bench training throughput on the digits64 campaign
config (VERDICT r4 #4: "one campaign where the chip, not the host, is
the bottleneck").

Round 4's digits64 campaign ran ~10 steps/s: the chip idled behind the
Python loader + per-step relay dispatch, so the accuracy evidence never
came with a production throughput number. With the device-resident
pipeline (data/device.py) an epoch is ONE device program; this script
measures, in one process on the real chip:

  bench_img_s     — a single warmed epoch_fn call, timed alone (the
                    exact structure bench.py times: fori_loop of steps)
  sustained_img_s — the FULL production campaign via run_training:
                    30 epochs with per-epoch raw+EMA eval, CSV logging,
                    TensorBoard scalars and orbax checkpoints, wall
                    clock end to end (includes the one-time compiles)
  steady_img_s    — the same campaign excluding epoch 0 (compile) —
                    the sustained number a long campaign converges to

plus the final val accuracy, so the throughput claim and the
accuracy-rises claim are the SAME run (the reference ships exactly this
coupling in its log CSVs, imagenet_classification/log/*.csv).

Run: python benchmarks/digits64_sustained_tpu.py [--epochs 30]
"""

import argparse
import csv
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--save_dir", default=None)
    args = ap.parse_args()

    from fastvim_tpu.cli.common import enable_compilation_cache
    from fastvim_tpu.config import load_config
    from fastvim_tpu.data.device import (
        load_device_digits,
        make_device_augment,
        make_device_epoch_fn,
        make_device_eval_fn,
    )
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_train_step,
    )
    from fastvim_tpu.train.loop import run_training

    enable_compilation_cache()
    cfg = load_config("digits64", domain="classification")
    cfg["training_epochs"] = args.epochs
    save_dir = args.save_dir or tempfile.mkdtemp(prefix="digits64_")

    model = create_model(
        cfg["model"], img_size=cfg["img_size"],
        patch_size=cfg["patch_size"], num_classes=cfg["num_classes"],
        drop_path_rate=cfg["drop_path_rate"],
        layer_fused=cfg.get("layer_fused", "auto"))
    tr_u8, tr_y, val_x, val_y, _ = load_device_digits(
        cfg["img_size"], seed=cfg["seed"])
    b = cfg["batch_size"]
    spe = int(tr_u8.shape[0]) // b

    rng = jax.random.PRNGKey(cfg["seed"])
    x0 = jnp.zeros((2, cfg["img_size"], cfg["img_size"], 3))
    params = model.init(jax.random.PRNGKey(cfg["seed"] + 1), x0)
    tx = make_optimizer(
        cosine_with_warmup(cfg["lr"], cfg["min_lr"],
                           args.epochs * spe,
                           cfg["warmup_epochs"] * spe,
                           cfg.get("warmup_initial_lr", 0.0)),
        weight_decay=cfg["weight_decay"], params=params)
    state = TrainState.create(params, tx, ema=True)
    train_step = make_supervised_train_step(
        model, cfg["num_classes"],
        label_smoothing=cfg.get("label_smoothing", 0.1),
        ema_decay=cfg.get("ema_decay", 0.99))
    epoch_fn, spe2 = make_device_epoch_fn(
        train_step, tr_u8, tr_y, b, make_device_augment(cfg["img_size"]))
    assert spe2 == spe
    eval_fn = make_device_eval_fn(model, val_x, val_y, b)

    # --- full production campaign, wall-clock (includes compiles) ----
    epoch_times = []
    orig_epoch_fn = epoch_fn

    def timed_epoch(st, r, e):
        t = time.perf_counter()
        st, m = orig_epoch_fn(st, r, e)
        m = {k: float(v) for k, v in m.items()}  # force the transfer
        epoch_times.append(time.perf_counter() - t)
        return st, m

    t0 = time.perf_counter()
    state = run_training(
        state=state, epochs=args.epochs, rng=rng, epoch_fn=timed_epoch,
        eval_fn=eval_fn, steps_per_epoch=spe, save_dir=save_dir)
    wall = time.perf_counter() - t0

    with open(os.path.join(save_dir, "log.csv")) as f:
        rows = list(csv.DictReader(f))
    best_acc = max(float(r.get("val_acc_ema", r["val_acc"]))
                   for r in rows)
    final_acc = float(rows[-1].get("val_acc_ema", rows[-1]["val_acc"]))

    # --- bench-style: one more warmed epoch, timed alone -------------
    tb = time.perf_counter()
    state, m = orig_epoch_fn(state, rng, args.epochs)
    _ = {k: float(v) for k, v in m.items()}
    bench_s = time.perf_counter() - tb

    imgs_per_epoch = spe * b
    steady_wall = sum(epoch_times[1:])
    out = {
        "metric": "digits64_sustained_vs_bench",
        "config": "digits64 (fastvim_tiny 64px p8 fused)",
        "batch": b, "steps_per_epoch": spe, "epochs": args.epochs,
        "bench_img_s": round(imgs_per_epoch / bench_s, 1),
        "sustained_img_s": round(args.epochs * imgs_per_epoch / wall, 1),
        "steady_img_s": round(
            (args.epochs - 1) * imgs_per_epoch / steady_wall, 1)
        if args.epochs > 1 else None,
        "steady_over_bench": round(
            (args.epochs - 1) * imgs_per_epoch / steady_wall
            / (imgs_per_epoch / bench_s), 3) if args.epochs > 1 else None,
        "epoch0_s": round(epoch_times[0], 1),
        "wall_s": round(wall, 1),
        "best_val_acc_ema": round(best_acc, 4),
        "final_val_acc_ema": round(final_acc, 4),
        "save_dir": save_dir,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
