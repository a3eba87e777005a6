"""Benchmark: FastVim-T inference throughput on one TPU chip.

Primary metric: images/sec at 2048×2048 (the reference's headline setting,
README.md:15 — FastVim is "up to 72.5% faster than Vim" there, i.e. a
1.725× ratio on A100 CUDA kernels). ``vs_baseline`` reports our measured
FastVim/Vim speedup ratio at 2048px divided by that 1.725× reference
ratio — >1.0 means the TPU port beats the reference's headline speedup.

Timing methodology: the forward pass is looped ON DEVICE inside one jit
(each iteration data-depends on the last, so XLA cannot hoist or dedupe),
and two loop lengths are differenced to cancel the host↔device round-trip
(which dominates through remote-execution relays and makes naive
block_until_ready timing meaningless).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def make_looped(model, params, x, n):
    @jax.jit
    def run(params, x):
        def body(i, s):
            out = model.apply(params, x + s)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return lambda: float(run(params, x))


def time_fn(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def throughput(model_name, img_size, batch, n1=4, n2=12,
               dtype=jnp.bfloat16, layer_fused=None, **kw):
    from fastvim_tpu.models import create_model

    if layer_fused is not None:
        # fused two-pass layer kernel (ops/pallas/layer_fused.py) —
        # parity-locked vs the XLA path; wins forward (201 vs 86.6
        # img/s @2048) and training (47.1 vs 23.6, adjoint backward).
        # Dispatched via the `layer_fused` CONFIG field (round 4) —
        # the production path, no env setup.
        kw["layer_fused"] = "on" if layer_fused else "off"
    model = create_model(model_name, img_size=img_size, dtype=dtype,
                         drop_path_rate=0.0, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, img_size, img_size, 3), dtype)
    params = model.init(jax.random.PRNGKey(0), x)
    f1 = make_looped(model, params, x, n1)
    f2 = make_looped(model, params, x, n2)
    f1()  # compile
    f2()
    dt = (time_fn(f2) - time_fn(f1)) / (n2 - n1)
    return batch / dt


def train_throughput(model_name, img_size, batch, n1=2, n2=8,
                     layer_fused="auto"):
    """Supervised train-step throughput with the fused adjoint backward
    (benchmarks/train_fused_tpu.py measured 47.1 vs 23.6 img/s @2048 —
    the megakernel's 2× training win). One compile: the loop length is
    a traced argument."""
    from fastvim_tpu.models import create_model
    from fastvim_tpu.train import (
        TrainState,
        cosine_with_warmup,
        make_optimizer,
        make_supervised_train_step,
    )

    model = create_model(model_name, img_size=img_size,
                         dtype=jnp.bfloat16, drop_path_rate=0.0,
                         layer_fused=layer_fused)
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (batch, img_size, img_size, 3), jnp.bfloat16)
    y0 = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(cosine_with_warmup(1e-3, 1e-5, 1000, 20),
                        weight_decay=0.05, params=params)
    state = TrainState.create(params, tx)
    step_fn = make_supervised_train_step(model, 1000,
                                         label_smoothing=0.1,
                                         ema_decay=None)

    @jax.jit
    def run_n(state, n):
        def body(i, carry):
            st, _ = carry
            k = jax.random.fold_in(jax.random.PRNGKey(3), i)
            imgs = jax.random.normal(k, x0.shape, x0.dtype)
            st, m = step_fn(st, {"image": imgs, "label": y0}, k)
            return st, m["train_loss"]

        return lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))[1]

    float(run_n(state, n1))  # compile (shared with n2: n is traced)

    def timed(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run_n(state, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(n2) - timed(n1)) / (n2 - n1)
    return batch / dt


# Family-win ride-through guards (VERDICT r3 #5): the round-3/4 family
# numbers lived only in STATUS/PERF — a regression was invisible to the
# bench artifact. Guard values are the measured wins; tolerance ±15%
# (the chip/relay itself drifts ±7% across hours, docs/PERF.md §6).
FAMILY_GUARDS = {
    # PERF.md §8 (round 4): MAE decoder scans routed to Pallas, b16
    "mae_base_pretrain_img_s": 392.9,
    # PERF.md §7 (round 3): ChannelVim-S HCS train b8, Pallas routing
    "channelvim_s_train_img_s": 218.8,
    # round-2 sweep: supervised train @224 b40 (14x14 grid not fusable)
    "fastvim_t_224_train_img_s": 1272.0,
    # STATUS r3: det/seg train steps @512 b8 with fused backbone
    "det_512_b8_train_img_s": 25.6,
    "seg_512_b8_train_img_s": 177.0,
}


def _family_value(key: str) -> float:
    """Measure one family's throughput in THIS process."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    if key == "mae_base_pretrain_img_s":
        from family_tpu import bench_mae

        return bench_mae("mae_FastVim_base_dec512d2b", 224,
                         16)["img_per_s"]
    if key == "channelvim_s_train_img_s":
        from family_tpu import bench_channel

        return bench_channel("fastchannelvim_small_ps16", 224,
                             8)["train"]["img_per_s"]
    if key == "fastvim_t_224_train_img_s":
        return train_throughput("fastvim_tiny", 224, 40)
    if key == "det_512_b8_train_img_s":
        from det_seg_tpu import bench_detection

        return bench_detection(512, 8)["img_per_s"]
    if key == "seg_512_b8_train_img_s":
        from det_seg_tpu import bench_segmentation

        return bench_segmentation(512, 8)["img_per_s"]
    raise KeyError(key)


def families(tol: float = 0.15, per_family_timeout: int = 2400):
    """Per-family step throughput + guard (reuses the family harnesses;
    benchmarks/family_tpu.py, benchmarks/det_seg_tpu.py).

    Each family runs in a FRESH SUBPROCESS (``bench.py --family KEY``):
    the guard values were measured in fresh processes, and the first
    in-process run showed both failure modes isolation prevents —
    Pallas-routed families measured 35-43% low after the headline
    programs had run in the same process, and a TPU-worker crash in the
    detection family poisoned every measurement after it. Compiles
    dominate family cost anyway, so isolation adds only interpreter
    startup."""
    import subprocess

    out, ok = {}, True
    for key, guard in FAMILY_GUARDS.items():
        entry = None
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--family", key],
                capture_output=True, text=True,
                timeout=per_family_timeout)
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    entry = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if entry is None:
                entry = {"error": (proc.stderr or "no output")[-160:]}
        except subprocess.TimeoutExpired:
            entry = {"error": f"timeout after {per_family_timeout}s"}
        if "img_per_s" in entry:
            passed = entry["img_per_s"] >= (1 - tol) * guard
        else:
            passed = False
        entry.update(guard=guard, ok=passed)
        out[key] = entry
        ok &= passed
        print(json.dumps({key: entry}), flush=True)
    return out, ok


def sweep(tol: float = 0.05):
    """Batch-size sweep guard (VERDICT r2 weak #5): the pinned batches
    ride non-monotonic XLA schedule cliffs; a compiler update can strand
    >30%. Re-measures the neighbourhood of each pinned batch and reports
    whether the pin is still within ``tol`` of the sweep max.

    Prints one JSON line per resolution plus a final ok/regressed line;
    exits nonzero if a pin has fallen more than ``tol`` behind.
    """
    pins = {224: (40, [32, 40, 48, 64]), 2048: (2, [1, 2, 3, 4])}
    ok = True
    for img, (pin, batches) in pins.items():
        rates = {}
        for b in batches:
            try:
                rates[b] = round(throughput("fastvim_tiny", img, b,
                                            layer_fused=(img == 2048)), 2)
            except Exception as e:
                rates[b] = None
                print(json.dumps({"img": img, "batch": b,
                                  "error": str(e)[:120]}))
        valid = {b: r for b, r in rates.items() if r}
        if not valid:  # every batch failed — report, don't crash
            ok = False
            print(json.dumps({"img": img, "pinned_batch": pin,
                              "sweep": rates, "best_batch": None,
                              "pin_within_tol": False,
                              "error": "all batches failed"}))
            continue
        best_b = max(valid, key=valid.get)
        pin_ok = valid.get(pin, 0.0) >= (1 - tol) * valid[best_b]
        ok &= pin_ok
        print(json.dumps({"img": img, "pinned_batch": pin,
                          "sweep": rates, "best_batch": best_b,
                          "pin_within_tol": pin_ok}))
    print(json.dumps({"sweep_ok": ok}))
    return 0 if ok else 1


def main(skip_families: bool = False):
    results = {}
    # Batch choices from the round-2/3 sweeps on v5e (non-monotonic XLA
    # schedule cliffs; CLAUDE.md):
    #   @2048 fused layer kernel {1,2,3,4,6,8} → {133, 201, 166, 113,
    #     99, 108} img/s — best b2 (XLA path: b3 86.8)
    #   @224 {32,40,48,56,64,96,128} → {7040, 7378, 6808, 6289, 5652,
    #     5122, 2591} img/s — best b40 (14×14 grid is not fusable)
    b224, b2048, b2048_xla = 40, 2, 3
    results["fastvim_t_224_img_s"] = throughput("fastvim_tiny", 224, b224)
    results["fastvim_t_2048_img_s"] = throughput(
        "fastvim_tiny", 2048, b2048, layer_fused=True)
    results["fastvim_t_2048_xla_img_s"] = throughput(
        "fastvim_tiny", 2048, b2048_xla, layer_fused=False)
    try:
        # training win (fused adjoint backward): 47.1 vs 23.6 img/s
        results["fastvim_t_2048_train_img_s"] = train_throughput(
            "fastvim_tiny", 2048, 3)
    except Exception as e:
        results["fastvim_t_2048_train_img_s"] = None
        results["train_error"] = str(e)[:200]
    try:
        results["vim_t_2048_img_s"] = throughput("vim_tiny", 2048,
                                                 b2048_xla)
    except Exception as e:  # Vim baseline OOM/compile failure shouldn't kill
        results["vim_t_2048_img_s"] = None
        results["vim_error"] = str(e)[:200]

    if not skip_families:
        fam, fam_ok = families()
        results["families"] = fam
        results["families_ok"] = fam_ok

    value = results["fastvim_t_2048_img_s"]
    if results.get("vim_t_2048_img_s"):
        ratio = value / results["vim_t_2048_img_s"]
        vs_baseline = ratio / 1.725  # reference headline speedup, README.md:15
        results["speedup_vs_vim_2048"] = round(ratio, 4)
    else:
        vs_baseline = None

    print(json.dumps({
        "metric": "fastvim_tiny_2048px_images_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in results.items()},
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="re-validate the pinned batch sizes against a "
                         "fresh sweep instead of running the bench")
    ap.add_argument("--skip_families", action="store_true",
                    help="headline numbers only (family guards skipped)")
    ap.add_argument("--family", default=None, choices=sorted(FAMILY_GUARDS),
                    help="measure ONE family in this process and print "
                         "{'img_per_s': N} (families() subprocess mode)")
    args = ap.parse_args()
    if args.sweep:
        sys.exit(sweep())
    if args.family:
        print(json.dumps(
            {"img_per_s": round(float(_family_value(args.family)), 1)}),
            flush=True)
        sys.exit(0)
    main(skip_families=args.skip_families)
