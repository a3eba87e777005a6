"""Root-cause probe for the family-guard shortfall (VERDICT r4 #2).

r4 guards: mae 392.9 img/s b16 (PERF §8), channelvim 218.8 b8 (PERF §7)
— both measured in their win sessions. r4's driver artifact AND an r5
fresh-child run with a TPU-clean orchestrator parent both measure ~34-43%
lower (mae 258.5, channel 122.7/124.9). Parent-process contamination is
therefore EXCLUDED; remaining hypotheses: (a) a real code regression
since the win sessions, (b) the chip/relay has slow modes far beyond the
documented ±7% drift, (c) harness context differences.

This script re-runs the ORIGINAL win harnesses, interleaved in one
process (PERF §6 discipline):
  channel: assoc vs Pallas-routing variants (channel_scan_ab_tpu.py's
           exact pairs) + the family-harness construction
  mae:     family_tpu.bench_mae (the §8 harness verbatim)

Readout: if today's Pallas-variant ≈ 122 and assoc ≈ 40, the 5.4×
routing WIN is intact and the absolute guard was calibrated in a faster
chip mode → re-base guards to fresh-context values with the ratio
locked. If Pallas ≈ 218 here but the family child measures ~122,
process context matters after all. If assoc ≈ pallas, the routing
itself broke (code regression).

Usage: python benchmarks/family_shortfall_ab_tpu.py [--which channel,mae]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def channel_probe():
    from channel_scan_ab_tpu import _interleaved, make_train

    # Two variants only — three resident TrainStates + the assoc
    # path's exposed fp32 scan temps RESOURCE_EXHAUST the 16 GB chip
    # (measured r5; the r3 win A/B also held exactly two).
    pairs = {}
    os.environ["FASTVIM_PALLAS_MIN_L"] = "1000000000"  # force assoc
    pairs["train_assoc"] = make_train("fastchannelvim_small_ps16",
                                      224, 8, 8)
    os.environ.pop("FASTVIM_PALLAS_MIN_L", None)  # model default (64)
    pairs["train_default64"] = make_train("fastchannelvim_small_ps16",
                                          224, 8, 8)
    out = _interleaved(pairs, 2, 8, 8)
    ratio = (out["train_default64"]["img_per_s"]
             / max(out["train_assoc"]["img_per_s"], 1e-9))
    out["routing_win_ratio"] = round(ratio, 2)
    return out


def mae_probe():
    from family_tpu import bench_mae

    return {"mae_b16": bench_mae("mae_FastVim_base_dec512d2b", 224, 16)}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="channel,mae")
    args = p.parse_args()
    from fastvim_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    if "channel" in args.which:
        out["channel"] = channel_probe()
        print(json.dumps({"channel": out["channel"]}), flush=True)
    if "mae" in args.which:
        out["mae"] = mae_probe()
        print(json.dumps({"mae": out["mae"]}), flush=True)
    print(json.dumps(out), flush=True)
