"""Dump optimized TPU HLO for the 2048px FastVim-T forward and build a
byte model: which full-length (B*L*d) buffers actually materialize in HBM,
per fusion, and how far measured throughput sits from the bandwidth bound.

Round-3 VERDICT item #1: "Hand-compute per-layer HBM bytes ... compare to
measured 86.4 img/s at 819 GB/s, and attack the top producer."

Usage: python benchmarks/hlo_bytes_tpu.py [--img 2048] [--batch 3]
Writes the optimized HLO text to /tmp/fastvim_2048_opt.hlo and prints a
table of the largest materialized buffers (fusion outputs), grouped by
shape signature.
"""
import argparse
import collections
import re
import sys

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=2048)
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--model", default="fastvim_tiny")
    p.add_argument("--out", default="/tmp/fastvim_opt.hlo")
    args = p.parse_args()

    from fastvim_tpu.models import create_model

    model = create_model(args.model, img_size=args.img, dtype=jnp.bfloat16,
                         drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.img, args.img, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)

    fwd = jax.jit(lambda p_, x_: model.apply(p_, x_))
    lowered = fwd.lower(params, x)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes of optimized HLO to {args.out}")

    try:
        ma = compiled.memory_analysis()
        print("memory_analysis:", ma)
    except Exception as e:
        print("memory_analysis failed:", e)

    # Parse buffer-assignment-visible outputs: every non-fused root op with
    # a large shape.  Optimized HLO lines look like
    #   %name = bf16[3,16384,384]{...} fusion(...), kind=kLoop ...
    dtype_bytes = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4,
                   "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2}
    pat = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\w+)\[([\d,]*)\]\S*\s+(\w+)")
    sizes = collections.Counter()
    counts = collections.Counter()
    examples = {}
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = pat.match(line)
        if not m:
            continue
        name, dt, dims, op = m.groups()
        if op in ("constant", "parameter", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        if dt not in dtype_bytes or not dims:
            continue
        shape = tuple(int(d) for d in dims.split(","))
        nbytes = dtype_bytes[dt]
        for d in shape:
            nbytes *= d
        if nbytes < 1 << 20:  # ignore <1MB
            continue
        key = (op, dt, shape)
        sizes[key] += nbytes
        counts[key] += 1
        examples.setdefault(key, name)

    total = sum(sizes.values())
    print(f"\nTotal materialized bytes (entry, >1MB buffers): "
          f"{total/1e9:.3f} GB")
    print(f"{'op':<12} {'dtype':<5} {'shape':<24} {'count':>5} "
          f"{'total MB':>10}  example")
    for key, nb in sizes.most_common(40):
        op, dt, shape = key
        print(f"{op:<12} {dt:<5} {str(shape):<24} {counts[key]:>5} "
              f"{nb/1e6:>10.1f}  {examples[key]}")

    # Bandwidth bound: v5e HBM ~819 GB/s
    bw = 819e9
    # reads ~= writes for elementwise chains; approximate traffic as
    # 2x materialized outputs (each buffer written once, read ~once)
    t_est = 2 * total / bw
    print(f"\nNaive traffic estimate 2x outputs: {2*total/1e9:.2f} GB "
          f"-> {t_est*1e3:.1f} ms -> {args.batch/t_est:.1f} img/s bound")


if __name__ == "__main__":
    main()
