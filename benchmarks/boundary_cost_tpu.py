"""Layer-boundary cost of the megakernel path (VERDICT r3 weak #6).

docs/PERF.md §6 left one structural lever open: cross-layer fusion —
pass B of layer k fused with pass A of layer k+1 ("est ≲15%": halves
dispatches, drops one x̂ round-trip). This probe measures the
REALIZABLE part of that estimate directly. Adjacent layers tile in
transposed orders (even = row tiles, odd = column tiles), so a fused
B_k⊕A_{k+1} kernel still has to materialize x̂ to HBM for the next
layer's transposed read — the genuinely removable work is the
inter-layer add+LN streams (read out + read residual + write x̂ +
write residual) plus per-layer dispatch overhead. Skipping add_norm
entirely (FASTVIM_COMPONENT_ABLATE=noaddnorm, blocks.py) removes
exactly that, so (full − noaddnorm) is an UPPER bound on the
cross-layer lever.

Interleaved A/B (docs/PERF.md §6 measurement rule), fused megakernel
path @2048 b2 + the XLA path for reference.

Usage: python benchmarks/boundary_cost_tpu.py [--img 2048] [--batch 2]
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


def build(img, batch, layer_fused, ablate):
    os.environ["FASTVIM_COMPONENT_ABLATE"] = ablate
    from fastvim_tpu.models import create_model

    model = create_model("fastvim_tiny", img_size=img,
                         dtype=jnp.bfloat16, drop_path_rate=0.0,
                         layer_fused=layer_fused)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3),
                          jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)

    # x/params must be jit ARGUMENTS — big closure constants break the
    # remote relay (CLAUDE.md, relay HTTP 413 / constant materialization)
    @jax.jit
    def run(params, x, n):
        def body(i, s):
            out = model.apply(params, x + s)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(params, x, 1))  # compile under this env
    os.environ.pop("FASTVIM_COMPONENT_ABLATE", None)
    return run, params, x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=2048)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    cases = {
        "fused_full": ("on", "full"),
        "fused_noaddnorm": ("on", "noaddnorm"),
        "xla_full": ("off", "full"),
        "xla_noaddnorm": ("off", "noaddnorm"),
    }
    progs = {}
    for name, (lf, abl) in cases.items():
        progs[name] = build(args.img, args.batch, lf, abl)
        print(json.dumps({"compiled": name}), flush=True)

    n1, n2 = 4, 12
    best = {k: [float("inf")] * 2 for k in progs}
    for _ in range(args.reps):
        for name, (run, params, x) in progs.items():
            for j, n in enumerate((n1, n2)):
                t0 = time.perf_counter()
                float(run(params, x, n))
                best[name][j] = min(best[name][j],
                                    time.perf_counter() - t0)
    out = {}
    for name in progs:
        dt = (best[name][1] - best[name][0]) / (n2 - n1)
        out[name] = {"step_ms": round(1e3 * dt, 2),
                     "img_per_s": round(args.batch / dt, 1)}
    for pref in ("fused", "xla"):
        d = (out[f"{pref}_full"]["step_ms"]
             - out[f"{pref}_noaddnorm"]["step_ms"])
        out[f"{pref}_boundary_ms"] = round(d, 2)
        out[f"{pref}_boundary_pct"] = round(
            100 * d / out[f"{pref}_full"]["step_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
