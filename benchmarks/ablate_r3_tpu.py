"""Ablate the round-3 byte-reduction changes @2048 b3 on the real chip.

Each variant re-runs the model trace in a fresh combination of env flags
(read at trace time in mixer.py / ops/scan.py):
  pallas_min_l: 64 routes the pooled rows scan (L=128) to the Pallas
                kernel; 512 keeps the round-2 assoc scan.
  merge_pooled: sum the two direction outputs at pooled level (1 bcast).
  split_inproj: two dots instead of Dense(2*d_inner)+slice.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from bench import throughput  # noqa: E402

COMBOS = [
    ("r2-baseline", {"FASTVIM_PALLAS_MIN_L": "512",
                     "FASTVIM_MERGE_POOLED": "0",
                     "FASTVIM_SPLIT_INPROJ": "0"}),
    ("pallas-only", {"FASTVIM_PALLAS_MIN_L": "64",
                     "FASTVIM_MERGE_POOLED": "0",
                     "FASTVIM_SPLIT_INPROJ": "0"}),
    ("merge-only", {"FASTVIM_PALLAS_MIN_L": "512",
                    "FASTVIM_MERGE_POOLED": "1",
                    "FASTVIM_SPLIT_INPROJ": "0"}),
    ("split-only", {"FASTVIM_PALLAS_MIN_L": "512",
                    "FASTVIM_MERGE_POOLED": "0",
                    "FASTVIM_SPLIT_INPROJ": "1"}),
    ("all", {"FASTVIM_PALLAS_MIN_L": "64",
             "FASTVIM_MERGE_POOLED": "1",
             "FASTVIM_SPLIT_INPROJ": "1"}),
    ("paired-scan", {"FASTVIM_PALLAS_MIN_L": "512",
                     "FASTVIM_MERGE_POOLED": "0",
                     "FASTVIM_SPLIT_INPROJ": "0",
                     "FASTVIM_PAIRED_SCAN": "1"}),
]


def main():
    img = int(os.environ.get("ABLATE_IMG", "2048"))
    batch = int(os.environ.get("ABLATE_BATCH", "3"))
    results = {}
    for name, env in COMBOS:
        os.environ.update(env)
        try:
            r = throughput("fastvim_tiny", img, batch)
        except Exception as e:
            r = None
            results[name + "_error"] = str(e)[:200]
        results[name] = round(r, 2) if r else None
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"img": img, "batch": batch, **results}))


if __name__ == "__main__":
    main()
