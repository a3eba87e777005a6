"""Does the layer megakernel win at SMALL L? Decides the 224 project.

The fused two-pass layer kernel (ops/pallas/layer_fused.py) is the
2048px winner (201 vs 86.6 img/s), but @224 the 14x14 grid fails the
8-alignment `fusable` gate. Before building a padded-grid variant for
224, measure the kernel at the nearest fusable resolution (256px,
16x16 grid, L=256) against the XLA path at the same batches: if the
fused kernel does not clearly win at small L (latency-bound regime),
the 224 padding project is not worth the complexity.

  python benchmarks/small_l_fused_tpu.py --img 256 --batches 32,40,48
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--batches", default="32,40,48")
    p.add_argument("--model", default="fastvim_tiny")
    args = p.parse_args()

    import bench

    for fused in (False, True):
        for b in map(int, args.batches.split(",")):
            r = bench.throughput(args.model, args.img, b,
                                 layer_fused=fused)
            print(json.dumps({
                "img": args.img, "batch": b,
                "mode": "fused" if fused else "xla",
                "img_per_s": round(r, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
