"""Isolated RoIAlign cost on the real chip.

The det ablation (det_seg_tpu.py --task det_ablate, @512 b8) attributes
206.5 of the 247.7 ms cascade train step to RoIAlign — this harness
times the RoI ops alone (fwd and fwd+bwd, realistic cascade shapes) so
implementation variants can be A/B'd without 4-minute whole-detector
compiles. Interleaved timing per docs/PERF.md §6 (chip drifts ±7%).

Shapes mirror vitdet_FastVimT_coco @512 b8: 4 FPN levels
(128,64,32,16)², C=256 bf16, 512 rois/img for the 7x7 bbox RoI,
128 positives/img for the 14x14 mask RoI + 28x28 gt-mask target crop,
x3 cascade stages.

  python benchmarks/roi_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from fastvim_tpu.ops.boxes import multilevel_roi_align, roi_align

B, C, IMG = 8, 256, 512
LEVELS = (128, 64, 32, 16)
STRIDES = (4, 8, 16, 32)
R7, R14, STAGES = 512, 128, 3


def make_inputs(key):
    ks = jax.random.split(key, 8)
    feats = [jax.random.normal(ks[i], (B, h, h, C), jnp.bfloat16)
             for i, h in enumerate(LEVELS)]
    # roi scale distribution ~ training: mostly small, some large
    wh = jnp.exp(jax.random.uniform(ks[4], (B, R7, 2),
                                    minval=jnp.log(8.), maxval=jnp.log(400.)))
    xy = jax.random.uniform(ks[5], (B, R7, 2), minval=0., maxval=IMG)
    rois = jnp.concatenate([jnp.maximum(xy - wh / 2, 0),
                            jnp.minimum(xy + wh / 2, IMG)], -1)
    gtm = (jax.random.uniform(ks[6], (B, R14, IMG, IMG)) > 0.5
           ).astype(jnp.uint8)
    return feats, rois, gtm


def run_roi7(feats, rois, chunk, xfirst=False):
    def one(rois_i, *feats_i):
        return multilevel_roi_align(
            [f for f in feats_i], rois_i, 7, STRIDES, chunk=chunk,
            xfirst=xfirst)
    out = jax.vmap(one)(rois, *feats)
    return jnp.sum(out.astype(jnp.float32))


def run_roi14(feats, rois, chunk, xfirst=False):
    def one(rois_i, *feats_i):
        return multilevel_roi_align(
            [f for f in feats_i], rois_i[:R14], 14, STRIDES, chunk=chunk,
            xfirst=xfirst)
    out = jax.vmap(one)(rois, *feats)
    return jnp.sum(out.astype(jnp.float32))


def run_lvl0(feats, rois, chunk, out=7):
    def one(rois_i, f0):
        return roi_align(f0, rois_i, out, 1.0 / STRIDES[0], chunk=chunk)
    return jnp.sum(jax.vmap(one)(rois, feats[0]).astype(jnp.float32))


def run_einsum1_only(feats, rois):
    """Just the first contraction on level 0 (tmp materialization probe)."""
    import numpy as _np

    def one(rois_i, f0):
        H, W, C = f0.shape
        s = 14
        boxes = rois_i / STRIDES[0]
        y1, x1 = boxes[:, 1], boxes[:, 0]
        bh = jnp.maximum(boxes[:, 3] - y1, 1e-6)
        steps = (jnp.arange(s, dtype=f0.dtype) + 0.5) / s
        ys = jnp.clip(y1[:, None] + steps[None] * bh[:, None] - 0.5,
                      0, H - 1)
        iy = jnp.arange(H, dtype=f0.dtype)
        Y = jnp.maximum(0, 1 - jnp.abs(ys[..., None] - iy))
        Y = Y.reshape(-1, 7, 2, H).mean(axis=2)
        Yc = Y.reshape(-1, 64, 7, H)
        tmp = jax.lax.map(
            lambda Yi: jnp.einsum("rih,hwc->riwc", Yi, f0), Yc)
        return jnp.sum(tmp.astype(jnp.float32))

    return jnp.sum(jax.vmap(one)(rois, feats[0]))


def run_crop(gtm, rois):
    def one(gtm_i, rois_i):
        return jax.vmap(
            lambda m, r: roi_align(m[..., None], r[None], 28, 1.0)[
                0, ..., 0])(gtm_i.astype(jnp.float32), rois_i[:R14])
    return jnp.sum(jax.vmap(one)(gtm, rois))


def bench(name, fn, args, grad_wrt=None, n1=1, n2=4, reps=3):
    """fn(*args) -> scalar; grad_wrt: arg index to differentiate wrt
    (None = forward only)."""
    if grad_wrt is None:
        step = fn
    else:
        def step(*a):
            g = jax.grad(
                lambda x: fn(*a[:grad_wrt], x, *a[grad_wrt + 1:])
            )(a[grad_wrt])
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(g))

    @jax.jit
    def run_n(args, n):
        def body(i, acc):
            # iteration-to-iteration data dependency (the relay does not
            # block in block_until_ready; see bench.py)
            a = list(args)
            a[1] = a[1] + (acc * 1e-30).astype(a[1].dtype)
            return jnp.float32(1e-30) * step(*a)

        return lax.fori_loop(0, n, body, jnp.float32(0.))

    t0 = time.time()
    float(run_n(args, n1))
    compile_s = time.time() - t0
    print(json.dumps({"case": name, "compile_s": round(compile_s, 1)}),
          flush=True)
    return run_n, args, n1, n2


def main():
    global B, IMG, LEVELS, R7, R14
    if "--tiny" in sys.argv:  # CPU smoke: trace/lower sanity only
        B, IMG, LEVELS, R7, R14 = 2, 64, (16, 8, 4, 2), 64, 8
    feats, rois, gtm = make_inputs(jax.random.PRNGKey(0))
    feats = tuple(feats)

    cases = []
    if "--probe2" in sys.argv:
        for ch in (4, 8, 16):
            cases.append((f"roi7_fwd_c{ch}",
                          lambda f, r, c=ch: run_roi7(f, r, c),
                          (feats, rois), None))
            cases.append((f"roi7_bwd_c{ch}",
                          lambda f, r, c=ch: run_roi7(f, r, c),
                          (feats, rois), 0))
            cases.append((f"roi14_bwd_c{ch}",
                          lambda f, r, c=ch: run_roi14(f, r, c),
                          (feats, rois), 0))
    elif "--probe" in sys.argv:
        cases.append(("roi7_fwd", lambda f, r: run_roi7(f, r, 64),
                      (feats, rois), None))
        for ch in (8, 16, 64):
            cases.append((f"lvl0_fwd_c{ch}",
                          lambda f, r, c=ch: run_lvl0(f, r, c),
                          (feats, rois), None))
        cases.append(("einsum1_lvl0", run_einsum1_only,
                      (feats, rois), None))
    else:
        for xf in (False, True):
            tag = "_xf" if xf else ""
            cases.append((f"roi7_fwd{tag}",
                          lambda f, r, x=xf: run_roi7(f, r, 64, x),
                          (feats, rois), None))
            cases.append((f"roi7_bwd{tag}",
                          lambda f, r, x=xf: run_roi7(f, r, 64, x),
                          (feats, rois), 0))
            cases.append((f"roi14_bwd{tag}",
                          lambda f, r, x=xf: run_roi14(f, r, 64, x),
                          (feats, rois), 0))
        cases.append(("croptgt_fwd", run_crop, (gtm, rois), None))

    progs = {}
    for name, fn, args, gw in cases:
        try:
            progs[name] = bench(name, fn, args, grad_wrt=gw)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:300]}),
                  flush=True)

    # interleave all compiled programs (docs/PERF.md §6 drift rule)
    best = {k: [float("inf")] * 2 for k in progs}
    for _ in range(4):
        for name, (run_n, args, n1, n2) in progs.items():
            for j, n in enumerate((n1, n2)):
                t0 = time.perf_counter()
                float(run_n(args, n))
                best[name][j] = min(best[name][j],
                                    time.perf_counter() - t0)
    results = {}
    for name, (_, _, n1, n2) in progs.items():
        results[name] = 1e3 * (best[name][1] - best[name][0]) / (n2 - n1)
    print(json.dumps({"task": "roi_micro", **{k: round(v, 2)
                      for k, v in results.items()}}))


if __name__ == "__main__":
    main()
