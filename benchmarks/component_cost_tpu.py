"""Where does the 2048px forward actually spend time? (round 3)

The round-3 ablation proved the forward is NOT bandwidth-limited in the
way the HLO byte table suggested (all byte-reducing restructures lost).
This measures component costs by SUBTRACTION: throughput of the full
model vs variants with one stage short-circuited (numerics change, speed
is the signal). Flags are read at trace time in models/mixer.py.

  noscan : y = pooled input (skip x_proj/dt_proj/scan)
  noconv : xc = silu(xin) (skip both direction convs)
  nomerge: skip LN+gate (merged = y_f+y_b)

Usage: python benchmarks/component_cost_tpu.py [--img 2048] [--batch 3]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from bench import throughput  # noqa: E402

VARIANTS = ["full", "noscan", "noconv", "nomerge", "noscan+noconv"]


def main():
    img = int(os.environ.get("ABLATE_IMG", "2048"))
    batch = int(os.environ.get("ABLATE_BATCH", "3"))
    results = {}
    for name in VARIANTS:
        os.environ["FASTVIM_COMPONENT_ABLATE"] = name
        try:
            r = throughput("fastvim_tiny", img, batch)
            results[name] = round(r, 2)
        except Exception as e:
            results[name] = None
            results[name + "_error"] = str(e)[:160]
        print(json.dumps({name: results[name]}), flush=True)
    os.environ.pop("FASTVIM_COMPONENT_ABLATE", None)
    full = results.get("full")
    if full:
        ms = {k: round(batch / v * 1e3, 2) for k, v in results.items()
              if isinstance(v, float) and v}
        print(json.dumps({"img": img, "batch": batch, "img_s": results,
                          "batch_ms": ms}))


if __name__ == "__main__":
    main()
