"""Minimal repro probe for the 512px fused-megakernel TPU worker crash
(round 5): the det_512 bench family crashed the worker executing its
first train step with layer_fused=auto, and passed with
FASTVIM_LAYER_FUSED=0. Runs ONE case per process (a worker crash kills
the backend) on a bare fastvim_tiny @512 — no detection heads — to
bisect forward kernel vs adjoint backward kernels.

Usage: python benchmarks/probe512_tpu.py fwd|train_fused|train_remat|train_xla
       [--img 512] [--batch 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=["fwd", "train_fused", "train_remat",
                                     "train_xla"])
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.case == "train_remat":
        os.environ["FASTVIM_LF_BWD"] = "remat"

    from fastvim_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import bench

    t0 = time.time()
    if args.case == "fwd":
        v = bench.throughput("fastvim_tiny", args.img, args.batch,
                             layer_fused=True)
    elif args.case == "train_xla":
        v = bench.train_throughput("fastvim_tiny", args.img, args.batch,
                                   layer_fused="off")
    else:
        v = bench.train_throughput("fastvim_tiny", args.img, args.batch,
                                   layer_fused="on")
    print(json.dumps({"case": args.case, "img": args.img,
                      "batch": args.batch, "img_per_s": round(v, 2),
                      "elapsed_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
