"""Hardware grad parity: fused adjoint kernels vs rematerializing VJP.

tests/test_layer_fused.py locks the fused backward against jax.vjp of
the reference in INTERPRET mode (CPU). This checks the Mosaic-compiled
adjoint kernels on the real chip: jax.grad of a scalar loss through the
full model, FASTVIM_LF_BWD=fused vs =remat, same params/input, reported
as per-parameter max relative error.

  python benchmarks/grad_parity_tpu.py [--img 256] [--batch 1]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def grads(mode, img, batch, model_name):
    os.environ["FASTVIM_LAYER_FUSED"] = "1"
    os.environ["FASTVIM_LF_BWD"] = mode

    from fastvim_tpu.models import create_model

    model = create_model(model_name, img_size=img, dtype=jnp.bfloat16,
                         drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, img, img, 3),
                          jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = model.apply(p, x)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    # fresh closure per mode -> fresh trace (env read at trace time)
    g = jax.jit(jax.grad(loss))(params)
    return jax.device_get(g)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--model", default="fastvim_tiny")
    args = p.parse_args()

    g_fused = grads("fused", args.img, args.batch, args.model)
    g_remat = grads("remat", args.img, args.batch, args.model)

    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_r = jax.tree_util.tree_leaves(g_remat)
    worst = ("", 0.0)
    n_bad = 0
    for (path, a), b in zip(flat_f, flat_r):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        name = jax.tree_util.keystr(path)
        if rel > worst[1]:
            worst = (name, rel)
        if rel > 0.05:
            n_bad += 1
            print(json.dumps({"param": name, "rel_err": round(rel, 5)}))
    print(json.dumps({
        "model": args.model, "img": args.img, "batch": args.batch,
        "worst_param": worst[0], "worst_rel_err": round(worst[1], 5),
        "params_over_5pct": n_bad,
        "ok": bool(worst[1] < 0.05),
    }))
    sys.exit(0 if worst[1] < 0.05 else 1)


if __name__ == "__main__":
    main()
