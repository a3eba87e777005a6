"""Inspect how GSPMD lowers the seq-sharded forward (VERDICT r2 weak #7).

Compiles the FastVim-T 512px forward over a data×seq virtual CPU mesh and
greps the optimized HLO for the collectives the partitioner inserted —
answering whether the L-sharded path runs on collective-permutes (the
SURVEY §2.6 ppermute prefix handoff) or degrades to all-gathers.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/seqshard_hlo.py
"""
import collections
import re

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from fastvim_tpu.models import create_model
    from fastvim_tpu.parallel import mesh as M

    mesh = M.make_mesh(data=4, seq=2)
    model = create_model("fastvim_tiny", img_size=512, dtype=jnp.float32,
                         drop_path_rate=0.0)
    x = jnp.zeros((4, 512, 512, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    fwd = jax.jit(lambda p, xx: model.apply(p, xx))
    compiled = fwd.lower(params, xs).compile()
    txt = compiled.as_text()

    colls = collections.Counter()
    shapes = collections.defaultdict(set)
    for m in re.finditer(
            r"(\w+)\[([\d,]*)\][^=]*\b"
            r"(all-gather|all-reduce|collective-permute|all-to-all|"
            r"reduce-scatter)\b", txt):
        dt, dims, op = m.groups()
        colls[op] += 1
        shapes[op].add(f"{dt}[{dims}]")
    print("collective op counts in optimized HLO:")
    for op, c in colls.most_common():
        ex = sorted(shapes[op], key=len, reverse=True)[:4]
        print(f"  {op:<20} x{c:<4} shapes: {ex}")
    if not colls:
        print("  (none found)")


if __name__ == "__main__":
    main()
