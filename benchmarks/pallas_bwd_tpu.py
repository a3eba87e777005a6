"""Real-TPU validation of the fused chunk-recompute Pallas backward
(VERDICT r1 #4). Prints one JSON line with:

* grad parity (pallas vs XLA assoc autodiff) at L=4096
* compile-time memory analysis at L=16384, d=384: temp bytes of the
  pallas-bwd train step vs the assoc-autodiff train step (the assoc path
  materializes O(L·n·d) fp32 intermediates — ~3 GB at this shape)
* Vim-baseline-style scan train-step time at L=4096 (1024px-equivalent
  token count), pallas vs assoc

Run on the TPU session env (axon): python benchmarks/pallas_bwd_tpu.py
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from fastvim_tpu.ops.pallas.selective_scan import selective_scan_pallas
from fastvim_tpu.ops.scan import selective_scan_assoc


def make_args(key, batch, L, d, n, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (batch, L, d), dtype)
    delta = jax.random.normal(ks[1], (batch, L, d), dtype) * 0.1
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (batch, L, n), dtype)
    C = jax.random.normal(ks[4], (batch, L, n), dtype)
    D = jnp.ones((d,))
    bias = jax.random.normal(ks[5], (d,)) * 0.1
    return u, delta, A, B, C, D, bias


def loss_fn(scan, args, reverse=False):
    u, delta, A, B, C, D, bias = args
    y = scan(u, delta, A, B, C, D=D, delta_bias=bias,
             delta_softplus=True, reverse=reverse)
    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6


def grads(scan, args, reverse=False):
    return jax.grad(lambda a: loss_fn(scan, a, reverse))(args)


def rel_err(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.max(jnp.abs(a - b))
                 / (jnp.max(jnp.abs(b)) + 1e-9))


def timed_loop(step, args, n1=2, n2=6):
    def looped(n):
        @jax.jit
        def run(args):
            def body(i, s):
                g = step(jax.tree_util.tree_map(
                    lambda x: x + (s * 1e-30).astype(x.dtype), args))
                return sum(jnp.sum(x.astype(jnp.float32)) * 1e-30
                           for x in jax.tree_util.tree_leaves(g))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        return lambda: float(run(args))

    f1, f2 = looped(n1), looped(n2)
    f1(); f2()

    def t(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); f()
            b = min(b, time.perf_counter() - t0)
        return b
    return (t(f2) - t(f1)) / (n2 - n1)


def main():
    out = {}
    # ---- parity at L=4096 (both directions) ----
    args = make_args(jax.random.PRNGKey(0), 1, 4096, 384, 16)
    for rev in (False, True):
        gp = jax.jit(lambda a: grads(selective_scan_pallas, a, rev))(args)
        ga = jax.jit(lambda a: grads(selective_scan_assoc, a, rev))(args)
        errs = [rel_err(x, y) for x, y in
                zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(ga))]
        out[f"grad_rel_err_{'rev' if rev else 'fwd'}"] = round(max(errs), 6)

    # ---- compile-time memory at L=16384 ----
    args16 = make_args(jax.random.PRNGKey(1), 1, 16384, 384, 16)

    def temp_bytes(scan):
        f = jax.jit(lambda a: grads(scan, a))
        mem = f.lower(args16).compile().memory_analysis()
        return int(getattr(mem, "temp_size_in_bytes", -1))

    out["pallas_bwd_temp_mb_L16k"] = round(
        temp_bytes(selective_scan_pallas) / 2**20, 1)
    out["assoc_bwd_temp_mb_L16k"] = round(
        temp_bytes(selective_scan_assoc) / 2**20, 1)

    # ---- train-step time at L=4096 ----
    out["pallas_step_ms_L4096"] = round(1e3 * timed_loop(
        lambda a: grads(selective_scan_pallas, a), args), 3)
    out["assoc_step_ms_L4096"] = round(1e3 * timed_loop(
        lambda a: grads(selective_scan_assoc, a), args), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
