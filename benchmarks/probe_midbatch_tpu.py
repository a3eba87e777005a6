"""Interleaved probes for the fused layer's two open questions (r3):

1. batch cliff: @2048 the fused path measures b2 201 / b4 113 img/s —
   per-image cost nearly doubles. Which section scales superlinearly?
   NOSCAN removes the inter-pass XLA mid-section (x_proj/Δ GEMMs +
   pooled scans); if (base − noscan) grows much faster than 2× from
   b2→b4, the serialized mid-section is the cliff and folding it into
   pass B is the fix.
2. silu chain (23% of the step): the one untried exact reformulation —
   sigmoid via tanh (FASTVIM_LF_SILU_TANH), which replaces the VPU
   divide with a multiply if Mosaic has a native tanh.

Methodology per docs/PERF.md §6: every variant traces fresh in THIS
process; the base config brackets the sequence so cross-hour drift is
visible.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
os.environ["FASTVIM_LAYER_FUSED"] = "1"
from bench import throughput  # noqa: E402

PROBES = [
    ("base-b2", 2, {}),
    ("base-b4", 4, {}),
    ("noscan-b2", 2, {"FASTVIM_LF_NOSCAN": "1"}),
    ("noscan-b4", 4, {"FASTVIM_LF_NOSCAN": "1"}),
    ("nosilu-b4", 4, {"FASTVIM_LF_NOSILU": "1"}),
    ("noconv-b4", 4, {"FASTVIM_LF_NOCONV": "1"}),
    ("tanh-b2", 2, {"FASTVIM_LF_SILU_TANH": "1"}),
    ("tanh-b4", 4, {"FASTVIM_LF_SILU_TANH": "1"}),
    ("base-b2-re", 2, {}),
    ("base-b4-re", 4, {}),
]

CLEAR = ["FASTVIM_LF_NOSCAN", "FASTVIM_LF_NOSILU", "FASTVIM_LF_NOCONV",
         "FASTVIM_LF_SILU_TANH"]


def main():
    img = int(os.environ.get("PROBE_IMG", "2048"))
    results = {}
    for name, batch, env in PROBES:
        for k in CLEAR:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            r = throughput("fastvim_tiny", img, batch)
            results[name] = round(r, 2)
        except Exception as e:  # keep going — record the failure
            results[name] = None
            results[name + "_error"] = str(e)[:200]
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"img": img, **results}))


if __name__ == "__main__":
    main()
